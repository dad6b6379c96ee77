#!/usr/bin/env python
"""Attribute the golden-case log(P) gap: engine f32 error vs reference f32 error.

VERDICT r3 weak #3: case_l (N=64) sits at |Δlog P| = 1.9e-3 against the
golden with no attribution. This tool settles it with the all-f64 oracle
(tests/oracle/oracle.py — a double-precision transliteration of the
reference math, /root/reference/bioem_algorithm.h:18-70):

    Δ(engine, golden) ≤ Δ(engine, oracle) + Δ(oracle, golden)

* Δ(oracle, golden)  — the reference binary's own float32 pixel-path error
  (myfloat_t = float, defs.h:56-62) at this N. The engine cannot beat this.
* Δ(engine, oracle)  — the rebuild's true numerical error (f32 FFT banks,
  split-precision log1p path, stride-folded displacement matmuls).

Usage: python tools/golden_error_budget.py [case_l_n64 case_n_n224 ...]
"""

import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA = os.path.join(REPO, "tests", "golden", "data")


def parse_golden(path):
    vals = {}
    with open(path) as f:
        for line in f.read().splitlines():
            m = re.match(r"RefMap: (\d+) LogProb:\s+(\S+)", line)
            if m:
                vals[int(m.group(1))] = float(m.group(2))
    return np.array([vals[i] for i in range(len(vals))])


def load_case(case_dir):
    from bioem_tpu.core.orientations import build_orientations
    from bioem_tpu.io.map_io import read_ref_maps
    from bioem_tpu.io.model_io import read_model
    from bioem_tpu.params import read_parameters

    ang = os.path.join(case_dir, "euler.txt")
    p = read_parameters(
        os.path.join(case_dir, "param.txt"),
        not_uniform_angles=os.path.exists(ang),
    )
    images = read_ref_maps(
        os.path.join(case_dir, "maps.txt"), p.n_pixels,
        normalize=not p.no_map_norm,
    )
    model = read_model(
        os.path.join(case_dir, "model.txt"),
        pixel_size=p.pixel_size,
        center_mass=not p.no_center_mass,
    )
    orients = build_orientations(p, ang if os.path.exists(ang) else None)
    return p, orients, model, images


def budget(case: str):
    case_dir = os.path.join(DATA, case)
    p, orients, model, images = load_case(case_dir)
    lp_gold = parse_golden(
        os.path.join(case_dir, "Output_Probabilities.golden")
    )

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle.oracle import run_oracle

    res = run_oracle(
        p, orients,
        model.points.astype(np.float64),
        model.radii.astype(np.float64),
        model.densities.astype(np.float64),
        model.norm_den,
        images.maps,
    )
    lp_oracle = res.log_prob

    from bioem_tpu.config import RunConfig
    from bioem_tpu.run import make_engine

    eng = make_engine(p, orients, model, images, RunConfig.from_env())
    lp_eng = eng.results(eng.run()).log_prob

    d_eng_gold = float(np.max(np.abs(lp_eng - lp_gold)))
    d_orc_gold = float(np.max(np.abs(lp_oracle - lp_gold)))
    d_eng_orc = float(np.max(np.abs(lp_eng - lp_oracle)))
    import jax

    print(f"{case} (N={p.n_pixels}, backend={jax.default_backend()}):")
    print(f"  max |engine - golden| = {d_eng_gold:.3e}   (the golden-test metric)")
    print(f"  max |oracle - golden| = {d_orc_gold:.3e}   (reference's own f32 error)")
    print(f"  max |engine - oracle| = {d_eng_orc:.3e}   (rebuild's true f32 error)")
    return p.n_pixels, d_eng_gold, d_orc_gold, d_eng_orc


def main(argv=None) -> int:
    cases = (argv or sys.argv[1:]) or ["case_l_n64", "case_n_n224"]
    rows = [budget(c) for c in cases]
    print("\nN-scaling (quadrature law ~ N²·eps32):")
    for n, deg, dog, deo in rows:
        print(
            f"  N={n:4d}: engine-vs-oracle/N² = {deo / n**2:.2e}, "
            f"oracle-vs-golden/N² = {dog / n**2:.2e}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
