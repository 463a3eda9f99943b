"""Group a dumped XLA device trace by source file/line using the dumped HLO
text for fusion->op_name attribution. Ground-truth 'where does the step go'
at file granularity (the per-op view is too flat to read).

Usage: python tools/trace_group.py <logdir> <hlo.txt> [K_iters] [--lines]
"""
import sys

sys.path.insert(0, "/root/repo/tools")
from collections import defaultdict

from trace_render import hlo_op_lookup, parse_xplane


def main():
    logdir, hlo = sys.argv[1], sys.argv[2]
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    by_line = "--lines" in sys.argv
    totals = parse_xplane(logdir)
    look = hlo_op_lookup(hlo)
    grouped = defaultdict(float)
    unattr = 0.0
    grand = 0.0
    for name, us in totals.items():
        if (name.startswith("$") or name.startswith("jit_")
                or name.startswith("while") or "PjitFunction" in name
                or name in ("0", "ParseArguments") or "asarray" in name
                or "stop_trace" in name or "__array__" in name
                or "_value" in name or "wrapper" in name):
            continue
        grand += us
        opn, src = look.get(name.split("(")[0], ("", ""))
        if src:
            key = src if by_line else src.rsplit(":", 1)[0]
            key = key.split("/")[-1] if not by_line else \
                "/".join(key.rsplit("/", 2)[-2:])
            grouped[key] += us
        else:
            # pallas kernels keep their own names
            base = name.split(".")[0].split("(")[0][:48]
            grouped[f"<{base}>"] += us
            unattr += 0
    print(f"total device op-time: {grand/1000/K:.1f} ms/iter (K={K})")
    for k, us in sorted(grouped.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us/1000/K:9.2f} ms  {100*us/grand:5.1f}%  {k}")


if __name__ == "__main__":
    main()
