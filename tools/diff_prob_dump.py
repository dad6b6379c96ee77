#!/usr/bin/env python
"""Diff two DEBUG_PROB dumps (bioem_tpu.debug_prob format).

The reference's DEBUG_PROB workflow is printf + manual diff of CPU-vs-GPU
logs (/root/reference/bioem_algorithm.h:88-128, bioem_cuda.cu:308-313);
this tool aligns two dumps on the (iRefMap, iOrient, iConv, disx, disy)
key and reports the worst |Δlogpro| / |Δcc|.

Usage: python tools/diff_prob_dump.py A.txt B.txt [--atol 1e-3]
Exit status 1 if max |Δlogpro| > atol or the key sets differ.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioem_tpu.debug_prob import diff_dumps, read_dump  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dump_a")
    ap.add_argument("dump_b")
    ap.add_argument("--atol", type=float, default=1e-3)
    args = ap.parse_args(argv)

    a = read_dump(args.dump_a)
    b = read_dump(args.dump_b)
    dlog, dcc, worst, n_common, only_a, only_b = diff_dumps(a, b)
    print(f"common evaluations: {n_common}")
    if only_a or only_b:
        print(f"keys only in {args.dump_a}: {only_a}")
        print(f"keys only in {args.dump_b}: {only_b}")
    print(f"max |dlogpro| = {dlog:.6g}")
    print(f"max |dcc|     = {dcc:.6g}")
    if worst is not None:
        print(
            "worst at iRefMap %d iOrient %d iConv %d disx %d disy %d" % worst
        )
    ok = dlog <= args.atol and not only_a and not only_b and n_common > 0
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
