#!/usr/bin/env python3
"""Generate golden Output_Probabilities from the *reference* BioEM.

Builds the reference (/root/reference) against the naive-DFT FFTW shim in
tools/fftw_shim (no FFTW needed), synthesises tiny deterministic inputs, runs
the reference binary, and stores inputs + outputs under tests/golden/data/.
tests/test_golden.py then checks bioem_tpu reproduces the log-posteriors.

Run from the repo root:  python tools/make_goldens.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("BIOEM_REFERENCE", "/root/reference")
SHIM = os.path.join(REPO, "tools", "fftw_shim")
OUT = os.path.join(REPO, "tests", "golden", "data")
BUILD = "/tmp/bioem_ref_build"

REF_SOURCES = [
    "main.cpp", "bioem.cpp", "map.cpp", "model.cpp", "param.cpp",
    "autotuner.cpp", "timer.cpp",
]


def build_reference() -> str:
    os.makedirs(BUILD, exist_ok=True)
    binary = os.path.join(BUILD, "bioem_ref")
    srcs = [os.path.join(REF, s) for s in REF_SOURCES]
    srcs.append(os.path.join(SHIM, "fftw_shim.cpp"))
    cmd = [
        "g++", "-O2", "-std=c++14", "-w",
        "-I", SHIM, "-I", os.path.join(REF, "include"),
        "-o", binary, *srcs,
    ]
    subprocess.run(cmd, check=True)
    return binary


def write_model(path: str, rng) -> None:
    n = 10
    pts = rng.uniform(-6, 6, (n, 3))
    radii = rng.uniform(1.0, 3.2, n)
    dens = rng.uniform(40, 100, n)
    with open(path, "w") as f:
        for k in range(n):
            f.write(
                f"{pts[k,0]:.6f} {pts[k,1]:.6f} {pts[k,2]:.6f} "
                f"{radii[k]:.6f} {dens[k]:.6f}\n"
            )


def write_maps(path: str, rng, n_img: int, n_pix: int) -> None:
    maps = rng.normal(0, 1, (n_img, n_pix, n_pix))
    with open(path, "w") as f:
        for b in range(n_img):
            f.write(f"PARTICLE  {b}\n")
            for i in range(n_pix):
                for j in range(n_pix):
                    f.write(f"{i:8d}{j:8d}{maps[b, i, j]:16.8f}\n")


def write_quat_list(path: str, rng, n: int) -> None:
    q = rng.normal(0, 1, (n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    with open(path, "w") as f:
        f.write(f"{n:12d}\n")
        for row in q:
            f.write("".join(f"{v:12.6f}" for v in row) + "\n")


CASE_A_PARAM = """\
# golden case A: Euler grid, CTF mode
PIXEL_SIZE 1.5
NUMBER_PIXELS 16
GRIDPOINTS_ALPHA 2
GRIDPOINTS_BETA 2
CTF_B_ENV 1.0 100.0 2
CTF_DEFOCUS 0.5 1.5 2
CTF_AMPLITUDE 0.1 0.1 1
DISPLACE_CENTER 2 1
"""

CASE_B_PARAM = """\
# golden case B: quaternion list, PSF mode, per-angle output
PIXEL_SIZE 1.5
NUMBER_PIXELS 16
USE_QUATERNIONS
USE_PSF
PSF_AMPLITUDE 0.2 0.2 1
PSF_ENVELOPE 0.6 1.0 2
PSF_PHASE 0.5 1.5 2
DISPLACE_CENTER 2 2
WRITE_PROB_ANGLES 3
"""


def run_case(binary: str, name: str, param_text: str, n_img: int,
             quat_list: bool) -> None:
    case_dir = os.path.join(OUT, name)
    os.makedirs(case_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    write_model(os.path.join(case_dir, "model.txt"), rng)
    write_maps(os.path.join(case_dir, "maps.txt"), rng, n_img, 16)
    with open(os.path.join(case_dir, "param.txt"), "w") as f:
        f.write(param_text)
    args = [
        binary,
        "--Modelfile", "model.txt",
        "--Particlesfile", "maps.txt",
        "--Inputfile", "param.txt",
        "--OutputFile", "Output_Probabilities.golden",
    ]
    if quat_list:
        write_quat_list(os.path.join(case_dir, "quat.txt"), rng, 8)
        args += ["--ReadOrientation", "quat.txt"]
    env = dict(os.environ)
    env.pop("GPU", None)
    res = subprocess.run(args, cwd=case_dir, env=env, capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stdout[-3000:])
        print(res.stderr[-3000:])
        raise RuntimeError(f"reference run failed for {name}")
    if quat_list and os.path.exists(os.path.join(case_dir, "ANG_PROB")):
        shutil.move(
            os.path.join(case_dir, "ANG_PROB"),
            os.path.join(case_dir, "ANG_PROB.golden"),
        )
    print(f"golden case {name}: OK")


def main() -> int:
    binary = build_reference()
    run_case(binary, "case_a_euler_ctf", CASE_A_PARAM, 3, quat_list=False)
    run_case(binary, "case_b_quat_psf", CASE_B_PARAM, 2, quat_list=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
