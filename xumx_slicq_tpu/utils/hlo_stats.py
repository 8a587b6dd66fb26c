"""Roofline aggregation of an xprof trace: per-source-line device self-time
and HBM bytes.

The PERFORMANCE.md roofline tables are produced with this tool:

    python bench.py --profile /tmp/xprof              # capture (3 timed runs)
    python -m xumx_slicq_tpu.utils.hlo_stats /tmp/xprof --runs 3

It converts the captured .xplane.pb through xprof's hlo_stats view (the
same data the TensorBoard profile plugin shows) and groups op self-time /
HBM traffic by the framework source line, so "where do the milliseconds
and gigabytes go" maps straight back to slicqt.py/cdae.py lines. The
"Measured memory BW" column in hlo_stats includes on-chip (CMEM/vector)
traffic and can exceed the HBM peak; the HBM column is what a bandwidth
roofline compares against (~763 GiB/s on v5e).

Replaces the profiling half of the reference's perf practice (reference
README.md:154-160 reports wall-clock only; no per-op attribution tool).
"""

import argparse
import collections
import glob
import json
import re
import sys


def load_hlo_stats(logdir: str):
    """Convert the newest .xplane.pb under `logdir` to the hlo_stats table.
    Returns (cols, rows) as the xprof JSON 'cols'/'rows' payload."""
    try:
        from xprof.convert import raw_to_tool_data as r2t
    except ImportError as e:  # pragma: no cover - env without xprof
        raise RuntimeError(
            "xprof is not importable in this environment; capture the trace "
            "and run this tool where the xprof package is installed"
        ) from e

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    data, _ctype = r2t.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode(errors="replace")
    d = json.loads(data)
    return d["cols"], d["rows"]


def aggregate(cols, rows, runs: int = 1, strip_prefix: str = ""):
    """Group by source line. Returns (total_ms, total_hbm_gib, table) with
    table rows (ms_per_run, hbm_gib_per_run, achieved_gib_s, source)."""
    labels = [c["label"] for c in cols]
    i = {c: k for k, c in enumerate(labels)}
    agg = collections.defaultdict(lambda: [0.0, 0.0])
    tot_us = tot_hbm = 0.0
    for r in rows:
        c = r["c"]
        us = c[i["Total self time (us)"]]["v"]
        bw = c[i["HBM BW (GiB/s)"]]["v"]
        src = c[i["Source Info"]]["v"] or ""
        m = re.search(r"title=''>([^<]*)</div>", src)
        src = m.group(1) if m else ""
        if strip_prefix and src.startswith(strip_prefix):
            src = src[len(strip_prefix):]
        cat = c[i["HLO op category"]]["v"]
        gib = bw * (us / 1e6)
        key = src if src else f"[{cat}]"
        agg[key][0] += us
        agg[key][1] += gib
        tot_us += us
        tot_hbm += gib
    table = sorted(
        (
            (us / 1e3 / runs, gib / runs, gib / (us / 1e6) if us else 0.0, key)
            for key, (us, gib) in agg.items()
        ),
        reverse=True,
    )
    return tot_us / 1e3 / runs, tot_hbm / runs, table


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("logdir", help="profile dir passed to bench.py --profile")
    p.add_argument("--runs", type=int, default=3,
                   help="timed executions inside the trace window "
                        "(bench.py times 3); totals are divided by this")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--hbm-peak", type=float, default=763.0,
                   help="GiB/s roofline to report utilization against (v5e)")
    p.add_argument("--strip-prefix", default="/root/repo/xumx_slicq_tpu/")
    args = p.parse_args(argv)

    cols, rows = load_hlo_stats(args.logdir)
    tot_ms, tot_gib, table = aggregate(
        cols, rows, runs=args.runs, strip_prefix=args.strip_prefix
    )
    avg = tot_gib / (tot_ms / 1e3) if tot_ms else 0.0
    print(f"total device self time: {tot_ms:.1f} ms/run, "
          f"HBM {tot_gib:.1f} GiB/run, avg {avg:.0f} GiB/s "
          f"({100 * avg / args.hbm_peak:.0f}% of {args.hbm_peak:.0f} GiB/s peak)")
    print(f"{'ms':>8} {'GiB':>7} {'GiB/s':>7}  source")
    for ms, gib, bw, key in table[: args.top]:
        print(f"{ms:8.1f} {gib:7.2f} {bw:7.0f}  {key}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
