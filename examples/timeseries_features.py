"""Timeseries feature pipeline on baloo_spark's pandas surface.

The shape every market-data / telemetry feature build follows:
bucket events to a fixed grid (``dt.floor('15min')``) -> per-bucket
aggregates -> trailing rolling statistics (``Series.rolling`` over
partition-safe prefix scans) -> as-of join the features back onto the
raw event stream (duplicate feature timestamps resolve by input
order, pandas ``merge_asof`` semantics).

Run:  python examples/timeseries_features.py [sf_dir]
(default /root/testdata/sf0.001). Prints one JSON summary line.

Scale notes inline — nothing here plans a global single-partition
window: the rolling stats are prefix-scan + boundary-carry, the
bucket agg is one hash shuffle, and the as-of carry is the
union-and-carry plan (one shuffle keyed, range-partitioned unkeyed).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import baloo_spark as bl


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    ev = bl.read_parquet(os.path.join(sf_dir, "events.parquet"))

    # 1. fixed 15-minute grid: exact integer epoch-us floor (handles
    #    sub-second and pre-epoch timestamps; one narrow projection)
    ev["bucket"] = ev["ts"].dt.floor("15min")

    # 2. per-bucket activity: one hash-agg shuffle, map-side partials
    per_bucket = (ev[["bucket", "value"]]
                  .groupby("bucket").mean()
                  .sort_index())

    # 3. trailing rolling stats along the bucket grid — prefix scans
    #    (sum, sum^2, count) + ONE shared boundary-carry shift; holds
    #    at any series length, never a global window
    sr = per_bucket.reset_index().sort_values("bucket")["value"]
    feats = per_bucket.reset_index().sort_values("bucket")
    feats["roll_mean"] = sr.rolling(4, min_periods=1).mean()
    feats["roll_std"] = sr.rolling(4, min_periods=2).std()
    # close the window: shift every rolling stat one bucket forward,
    # so bucket B carries stats through B-1 only — no lookahead into
    # the bucket an event itself belongs to
    feats["roll_mean_closed"] = feats["roll_mean"].shift(1)
    feats["roll_std_closed"] = feats["roll_std"].shift(1)

    # 4. as-of join the CLOSED features back onto raw events: each
    #    event matches its own bucket's row (backward, inclusive) and
    #    reads the prior-buckets-only statistics
    enriched = bl.merge_asof(
        ev[["ts", "event_type", "value"]],
        feats[["bucket", "roll_mean_closed", "roll_std_closed"]]
        .rename(columns={"bucket": "ts"}),
        on="ts", direction="backward")

    # 5. resample face: the same grid as a one-liner — exact-width
    #    buckets, one hash-agg, gap buckets generated (not collected)
    res = ev[["ts", "value"]].resample("1H", on="ts").mean()

    # 6. exponentially-weighted trend: the decayed-carry scan (pandas
    #    C kernel per partition + an n_partitions driver carry); an
    #    EWM is NOT a prefix sum, so this is its own two-pass scheme
    ewm_last = (sr.ewm(span=8).mean().tail(1).to_pandas().iloc[0]
                if len(feats) else None)

    # 7. expanding (since-inception) statistics — prefix scans only,
    #    min/max included (unlike fixed rolling windows they
    #    decompose)
    exp_max = sr.expanding().max().tail(1).to_pandas().iloc[0] \
        if len(feats) else None

    # 8. r7: ewm volatility BOTH adjust flavors (the adjust=False
    #    second moments ride the kernel-state perturbation carry) and
    #    asfreq — conform the bucket series to an exact 30-minute
    #    grid with as-of fill (distributed spark.range grid + one
    #    as-of join; only the two boundary stamps touch the driver)
    vol_rec = (sr.ewm(span=8, adjust=False).std().tail(1)
               .to_pandas().iloc[0] if len(feats) else None)
    grid30 = (per_bucket.asfreq("30min", method="ffill")
              if len(feats) else None)

    # 9. r8: order statistics over fixed windows — a rolling MEDIAN
    #    does not decompose into prefix sums, so it rides the bounded
    #    local-carry pass (one frozen layout, a (w-1)-row donor carry
    #    per partition, pandas' C kernel in one Arrow pass); the
    #    centered mean smooths symmetrically (two-sided carry), and
    #    the rolling corr with the raw series is pure JVM (windowed
    #    pair sums are prefix sums)
    med9 = (sr.rolling(9, min_periods=3).median().tail(1)
            .to_pandas().iloc[0] if len(feats) else None)
    smooth = (sr.rolling(7, min_periods=2, center=True).mean()
              if len(feats) else None)
    smooth_corr = (smooth.rolling(24, min_periods=6).corr(sr).tail(1)
                   .to_pandas().iloc[0] if smooth is not None else None)

    # 10. r8: TIME-decay smoothing — ewm(halflife='2h') weights by
    #     actual stamp distance (the segmented-anchor carry scan),
    #     and rolling('6h') is a time-OFFSET window (prefix + as-of
    #     join) — both irregular-stamp-native, no resample needed
    evs = ev[["ts", "value"]].sort_values("ts") \
        .set_index("ts")["value"]
    tdecay = (evs.ewm(halflife="2h").mean().tail(1)
              .to_pandas().iloc[0] if len(feats) else None)
    troll = (evs.rolling("6h", min_periods=1).mean().tail(1)
             .to_pandas().iloc[0] if len(feats) else None)

    # 11. r10: MULTI-stat time window in ONE pass — each
    #     pandas-shaped call above pays its own prefix + as-of
    #     scheme; agg_pairs (engine extension) computes every
    #     requested sum/mean/count/cov/corr from one shared pass.
    #     Here: 6h rolling mean+count of value AND its rolling corr
    #     with the hour-of-day signal, one prefix pass total.
    evf = ev[["ts", "value"]].sort_values("ts")
    evf["hod"] = evf["ts"].dt.hour().astype("float64")
    fused = (evf.set_index("ts").rolling("6h", min_periods=1)
             .agg_pairs({"m6": ("mean", "value"),
                         "n6": ("count", "value"),
                         "c6": ("corr", "value", "hod")})
             .tail(1).to_pandas())
    fused_corr = (float(fused["c6"].iloc[0])
                  if len(fused) and fused["c6"].notna().all()
                  else None)

    out = enriched.to_pandas()
    summary = {
        "events": int(len(out)),
        "buckets": int(len(feats)),
        "with_features": int(out["roll_mean_closed_right"].notna().sum()),
        "hourly_buckets": int(len(res)),
        "ewm_last": None if ewm_last is None else round(float(ewm_last), 6),
        "expanding_max": None if exp_max is None else round(float(exp_max), 6),
        "ewm_vol_noadjust": None if vol_rec is None or vol_rec != vol_rec
                            else round(float(vol_rec), 6),
        "grid30_rows": None if grid30 is None else int(len(grid30)),
        "roll_median9": None if med9 is None or med9 != med9
                        else round(float(med9), 6),
        "smooth_corr24": None if smooth_corr is None
                         or smooth_corr != smooth_corr
                         else round(float(smooth_corr), 6),
        "tdecay_ewm_2h": None if tdecay is None or tdecay != tdecay
                         else round(float(tdecay), 6),
        "troll_6h_mean": None if troll is None or troll != troll
                         else round(float(troll), 6),
        "fused_corr_6h": None if fused_corr is None
                         else round(fused_corr, 6),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(*sys.argv[1:2])
