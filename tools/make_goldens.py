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


def build_reference(use_double: bool = False) -> str:
    """Build the reference against the naive-DFT shim.

    ``use_double=True`` adds -DBIOEM_USE_DOUBLE (reference
    include/defs.h:64-100: myfloat_t = double, fftw_* double-precision
    API — the shim implements both precisions): the reference's own
    full-double build, documented in doc/index.rst:1519-1533. Its output
    is EXTERNAL ground truth at ~1e-6, replacing the in-repo f64 oracle
    for the production-N accuracy claim (r4 verdict Missing #3)."""
    os.makedirs(BUILD, exist_ok=True)
    binary = os.path.join(BUILD, "bioem_ref_f64" if use_double else "bioem_ref")
    srcs = [os.path.join(REF, s) for s in REF_SOURCES]
    srcs.append(os.path.join(SHIM, "fftw_shim.cpp"))
    cmd = [
        "g++", "-O2", "-std=c++14", "-w",
        *(["-DBIOEM_USE_DOUBLE"] if use_double else []),
        "-I", SHIM, "-I", os.path.join(REF, "include"),
        "-o", binary, *srcs,
    ]
    subprocess.run(cmd, check=True)
    return binary


def write_model(path: str, rng, n: int = 10, spread: float = 6.0) -> None:
    pts = rng.uniform(-spread, spread, (n, 3))
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


def write_quat_list(path: str, rng, n: int, priors=None) -> None:
    q = rng.normal(0, 1, (n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    with open(path, "w") as f:
        f.write(f"{n:12d}\n")
        for k, row in enumerate(q):
            line = "".join(f"{v:12.6f}" for v in row)
            if priors is not None:
                line += f"{priors[k]:12.6f}"
            f.write(line + "\n")


def write_euler_list(path: str, rng, n: int, priors=None) -> None:
    """Euler-angle list (reference param.cpp:1050-1133: %12.6f columns)."""
    ang = rng.uniform(-np.pi, np.pi, (n, 3))
    ang[:, 1] = np.arccos(rng.uniform(-1, 1, n))  # beta ∈ [0, π]
    with open(path, "w") as f:
        f.write(f"{n:12d}\n")
        for k, row in enumerate(ang):
            line = "".join(f"{v:12.6f}" for v in row)
            if priors is not None:
                line += f"{priors[k]:12.6f}"
            f.write(line + "\n")


# Residue names drawn from the reference tables (model.cpp:738-844).
_RESIDUES = ["ALA", "GLY", "LYS", "TRP", "GLU", "SER", "VAL", "PRO", "HIS", "MET"]


def write_pdb(path: str, rng, n: int) -> None:
    """Cα-only PDB (reference parse: model.cpp:85-329 — ATOM + name CA,
    resName cols 18-20, x/y/z cols 31-54)."""
    pts = rng.uniform(-6, 6, (n, 3))
    with open(path, "w") as f:
        for k in range(n):
            res = _RESIDUES[k % len(_RESIDUES)]
            f.write(
                f"ATOM  {k + 1:5d}  CA  {res} A{k + 1:4d}    "
                f"{pts[k, 0]:8.3f}{pts[k, 1]:8.3f}{pts[k, 2]:8.3f}"
                f"  1.00  0.00\n"
            )


def write_voxel_mrc(path: str, rng, nvox: int) -> None:
    """Tiny voxel model: every voxel becomes a point of radius 2·pixelSize
    (reference model.cpp:332-416)."""
    sys.path.insert(0, REPO)
    from bioem_tpu.io.mrc import write_mrc

    vol = rng.uniform(0.5, 2.0, (nvox, nvox, nvox)).astype(np.float32)
    write_mrc(path, vol)


def write_mrc_stack(path: str, rng, n_img: int, n_pix: int) -> None:
    sys.path.insert(0, REPO)
    from bioem_tpu.io.mrc import write_mrc

    maps = rng.normal(0, 1, (n_img, n_pix, n_pix)).astype(np.float32)
    write_mrc(path, maps)


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
             quat_list: bool = False, euler_list: bool = False,
             priors: bool = False, model_kind: str = "text",
             maps_kind: str = "text", n_pix: int = 16,
             n_list: int = 8, model_n: int = 10,
             model_spread: float = 6.0, f64_binary: str = None) -> None:
    case_dir = os.path.join(OUT, name)
    os.makedirs(case_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    model_file = {"text": "model.txt", "pdb": "model.pdb", "mrc": "model.mrc"}[
        model_kind
    ]
    if model_kind == "text":
        write_model(
            os.path.join(case_dir, model_file), rng, n=model_n,
            spread=model_spread,
        )
    elif model_kind == "pdb":
        write_pdb(os.path.join(case_dir, model_file), rng, 10)
    else:
        write_voxel_mrc(os.path.join(case_dir, model_file), rng, 5)

    maps_file = {"text": "maps.txt", "mrc": "maps.mrc", "multimrc": "maps_list.txt"}[
        maps_kind
    ]
    if maps_kind == "text":
        write_maps(os.path.join(case_dir, maps_file), rng, n_img, n_pix)
    elif maps_kind == "mrc":
        write_mrc_stack(os.path.join(case_dir, maps_file), rng, n_img, n_pix)
    else:
        n1 = max(1, n_img // 2)
        write_mrc_stack(os.path.join(case_dir, "part1.mrc"), rng, n1, n_pix)
        write_mrc_stack(os.path.join(case_dir, "part2.mrc"), rng, n_img - n1, n_pix)
        with open(os.path.join(case_dir, maps_file), "w") as f:
            f.write("part1.mrc\npart2.mrc\n")

    with open(os.path.join(case_dir, "param.txt"), "w") as f:
        f.write(param_text)
    args = [
        binary,
        "--Modelfile", model_file,
        "--Particlesfile", maps_file,
        "--Inputfile", "param.txt",
        "--OutputFile", "Output_Probabilities.golden",
    ]
    if model_kind == "pdb":
        args.append("--ReadPDB")
    elif model_kind == "mrc":
        args.append("--ReadModelMRC")
    if maps_kind == "mrc":
        args.append("--ReadMRC")
    elif maps_kind == "multimrc":
        args += ["--ReadMRC", "--ReadMultipleMRC"]
    pvals = rng.uniform(0.5, 2.0, n_list) if priors else None
    if quat_list:
        write_quat_list(os.path.join(case_dir, "quat.txt"), rng, n_list, priors=pvals)
        args += ["--ReadOrientation", "quat.txt"]
    elif euler_list:
        write_euler_list(os.path.join(case_dir, "euler.txt"), rng, n_list, priors=pvals)
        args += ["--ReadOrientation", "euler.txt"]
    env = dict(os.environ)
    env.pop("GPU", None)
    res = subprocess.run(args, cwd=case_dir, env=env, capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stdout[-3000:])
        print(res.stderr[-3000:])
        raise RuntimeError(f"reference run failed for {name}")
    if os.path.exists(os.path.join(case_dir, "ANG_PROB")):
        shutil.move(
            os.path.join(case_dir, "ANG_PROB"),
            os.path.join(case_dir, "ANG_PROB.golden"),
        )
    print(f"golden case {name}: OK")
    if f64_binary is not None:
        # Same inputs (already on disk), full-double reference build:
        # writes the external-ground-truth golden next to the f32 one.
        args_f64 = list(args)
        args_f64[0] = f64_binary
        args_f64[args_f64.index("Output_Probabilities.golden")] = (
            "Output_Probabilities.f64.golden"
        )
        res = subprocess.run(
            args_f64, cwd=case_dir, env=env, capture_output=True, text=True
        )
        if res.returncode != 0:
            print(res.stdout[-3000:])
            print(res.stderr[-3000:])
            raise RuntimeError(f"f64 reference run failed for {name}")
        if os.path.exists(os.path.join(case_dir, "ANG_PROB")):
            shutil.move(
                os.path.join(case_dir, "ANG_PROB"),
                os.path.join(case_dir, "ANG_PROB.f64.golden"),
            )
        print(f"golden case {name} (f64): OK")


CASE_C_PARAM = CASE_A_PARAM.replace("case A: Euler grid, CTF mode",
                                    "case C: MRC particle stack")
CASE_D_PARAM = CASE_A_PARAM.replace("case A: Euler grid, CTF mode",
                                    "case D: multiple MRC stacks")
CASE_E_PARAM = CASE_A_PARAM.replace("case A: Euler grid, CTF mode",
                                    "case E: PDB model")
CASE_F_PARAM = CASE_A_PARAM.replace("case A: Euler grid, CTF mode",
                                    "case F: MRC voxel model")

CASE_G_PARAM = """\
# golden case G: Euler-angle list from file, CTF mode
PIXEL_SIZE 1.5
NUMBER_PIXELS 16
CTF_B_ENV 1.0 100.0 2
CTF_DEFOCUS 0.5 1.5 2
CTF_AMPLITUDE 0.1 0.1 1
DISPLACE_CENTER 2 1
"""

CASE_H_PARAM = """\
# golden case H: quaternion list with per-orientation priors
PIXEL_SIZE 1.5
NUMBER_PIXELS 16
USE_QUATERNIONS
PRIOR_ANGLES
CTF_B_ENV 1.0 100.0 2
CTF_DEFOCUS 0.5 1.5 2
CTF_AMPLITUDE 0.1 0.1 1
DISPLACE_CENTER 2 1
WRITE_PROB_ANGLES 3
"""

CASE_I_PARAM = """\
# golden case I: projection shifts, no map normalization, no center of mass
PIXEL_SIZE 1.5
NUMBER_PIXELS 16
GRIDPOINTS_ALPHA 2
GRIDPOINTS_BETA 2
SHIFT_X 1
SHIFT_Y 1
NO_MAP_NORM
NO_CENTEROFMASS
CTF_B_ENV 1.0 100.0 2
CTF_DEFOCUS 0.5 1.5 2
CTF_AMPLITUDE 0.1 0.1 1
DISPLACE_CENTER 2 1
"""

CASE_J_PARAM = """\
# golden case J: PSF mode with CTF-parameter output conversion
PIXEL_SIZE 1.5
NUMBER_PIXELS 16
GRIDPOINTS_ALPHA 2
GRIDPOINTS_BETA 2
USE_PSF
WRITE_CTF_PARAM
PSF_AMPLITUDE 0.2 0.2 1
PSF_ENVELOPE 0.6 1.0 2
PSF_PHASE 0.5 1.5 2
DISPLACE_CENTER 2 2
"""


CASE_K_PARAM = """\
# golden case K: uniform quaternion-ball grid (GRIDPOINTS_QUATERNION)
PIXEL_SIZE 1.5
NUMBER_PIXELS 16
USE_QUATERNIONS
GRIDPOINTS_QUATERNION 3
CTF_B_ENV 1.0 100.0 2
CTF_DEFOCUS 0.5 1.5 2
CTF_AMPLITUDE 0.1 0.1 1
DISPLACE_CENTER 2 1
WRITE_PROB_ANGLES 3
"""

CASE_L_PARAM = """\
# golden case L: production pixel count (N=64), few orientations
PIXEL_SIZE 1.5
NUMBER_PIXELS 64
CTF_B_ENV 1.0 100.0 2
CTF_DEFOCUS 0.5 1.5 2
CTF_AMPLITUDE 0.1 0.1 1
DISPLACE_CENTER 4 2
"""

CASE_N_PARAM = """\
# golden case N: PRODUCTION pixel count (N=224) + production-shaped grid —
# ties the production-shape numerics (stride-folded displacement lattice,
# 8-CTF bank) to the reference binary. Shapes match bench.py: D=21 lattice
# at stride 2, pixel size 1.06.
PIXEL_SIZE 1.06
NUMBER_PIXELS 224
CTF_B_ENV 2.0 100.0 2
CTF_DEFOCUS 0.5 2.5 4
CTF_AMPLITUDE 0.1 0.1 1
DISPLACE_CENTER 20 2
"""

BESTMAP_PARAM = """\
# golden case M: forward simulator BESTMAP (byte-compared)
PIXEL_SIZE 1.5
NUMBER_PIXELS 16
BEST_ALPHA 0.4
BEST_BETA 0.8
BEST_GAMMA -0.3
BEST_CTF_B_ENV 50.0
BEST_CTF_DEFOCUS 1.2
BEST_CTF_AMP 0.1
BEST_DX 0
BEST_DY 0
BEST_NORM 1.5
BEST_OFFSET 0.2
"""


def run_bestmap_case(binary: str, name: str) -> None:
    """--PrintBestCalMap golden: the reference's BESTMAP bytes
    (bioem.cpp:2040-2083; reference prints via ostream defaults = %.6g).
    BEST_DX/DY = 0: any non-zero displacement makes the reference's MAPddx
    branch read Mapconv out of bounds (bioem.cpp:2057-2065 has no lower
    bound check) — those bytes are garbage, not behaviour to match."""
    case_dir = os.path.join(OUT, name)
    os.makedirs(case_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    write_model(os.path.join(case_dir, "model.txt"), rng)
    with open(os.path.join(case_dir, "best.txt"), "w") as f:
        f.write(BESTMAP_PARAM)
    env = dict(os.environ)
    env.pop("GPU", None)
    res = subprocess.run(
        [binary, "--Modelfile", "model.txt", "--PrintBestCalMap", "best.txt"],
        cwd=case_dir, env=env, capture_output=True, text=True,
    )
    if res.returncode != 0:
        print(res.stdout[-3000:])
        print(res.stderr[-3000:])
        raise RuntimeError(f"reference bestmap run failed for {name}")
    shutil.move(
        os.path.join(case_dir, "BESTMAP"), os.path.join(case_dir, "BESTMAP.golden")
    )
    print(f"golden case {name}: OK")


def main() -> int:
    binary = build_reference()
    binary64 = build_reference(use_double=True)
    run_case(binary, "case_a_euler_ctf", CASE_A_PARAM, 3, f64_binary=binary64)
    run_case(binary, "case_b_quat_psf", CASE_B_PARAM, 2, quat_list=True)
    run_case(binary, "case_c_mrc_stack", CASE_C_PARAM, 4, maps_kind="mrc")
    run_case(binary, "case_d_multi_mrc", CASE_D_PARAM, 3, maps_kind="multimrc")
    run_case(binary, "case_e_pdb_model", CASE_E_PARAM, 3, model_kind="pdb")
    run_case(binary, "case_f_voxel_model", CASE_F_PARAM, 3, model_kind="mrc")
    run_case(binary, "case_g_euler_list", CASE_G_PARAM, 3, euler_list=True)
    run_case(binary, "case_h_prior_angles", CASE_H_PARAM, 3, quat_list=True,
             priors=True)
    run_case(binary, "case_i_shift_nonorm", CASE_I_PARAM, 3)
    run_case(binary, "case_j_psf_writectf", CASE_J_PARAM, 2)
    run_case(binary, "case_k_quat_grid", CASE_K_PARAM, 2)
    # N=64 through the naive-DFT shim is O(N⁴) per transform — 2 list
    # orientations keep the reference run to seconds (the reference's own
    # fast-sanity trick, BIOEM_DEBUG_BREAK, bioem.cpp:518-525).
    run_case(binary, "case_l_n64", CASE_L_PARAM, 2, euler_list=True, n_pix=64,
             n_list=2, f64_binary=binary64)
    run_bestmap_case(binary, "case_m_bestmap")
    # Production-N golden: the double-precision row-column DFT shim makes
    # even N=224 tractable (O(N³) per transform); 2 orientations × 8 CTFs ×
    # 2 images keeps the reference run to ~a minute. The model is a
    # production-extent point cloud (±60 Å in the ±118.7 Å frame).
    run_case(binary, "case_n_n224", CASE_N_PARAM, 2, euler_list=True,
             n_pix=224, n_list=2, model_n=40, model_spread=60.0,
             f64_binary=binary64)
    return 0


if __name__ == "__main__":
    sys.exit(main())
