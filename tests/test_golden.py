"""Golden-value integration tests against the *actual reference binary*.

The files under tests/golden/data/ were produced by the reference BioEM
(/root/reference, compiled against the naive-DFT FFTW shim in
tools/fftw_shim — see tools/make_goldens.py). bioem_tpu must reproduce the
reference's log-posteriors and maximizing parameters on the same inputs
(SURVEY.md §4 implication; BASELINE.md accuracy metric max |Δlog P|).
"""

import os
import re
import shutil
import subprocess
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

# Float/naive-DFT reference vs float/XLA-FFT rebuild: log P agrees to
# quadrature tolerance, not bit equality (doc/index.rst:1519-1533 makes the
# same statement for CPU vs GPU).
LOGP_ATOL = 0.05


def parse_output(text: str):
    """(logp, const, params[]) per image from an Output_Probabilities file."""
    logp, const, params = {}, {}, {}
    for line in text.splitlines():
        m = re.match(r"RefMap: (\d+) LogProb:\s+(\S+) Constant:\s+(\S+)", line)
        if m:
            logp[int(m.group(1))] = float(m.group(2))
            const[int(m.group(1))] = float(m.group(3))
        m = re.match(r"RefMap: (\d+) Maximizing Param:\s+(.*)", line)
        if m:
            vals = re.findall(r"(-?\d+\.?\d*(?:[eE][+-]?\d+)?)\s*(?:\[[^\]]*\])?", m.group(2))
            params[int(m.group(1))] = [float(v) for v in vals]
    n = len(logp)
    return (
        np.array([logp[i] for i in range(n)]),
        np.array([const[i] for i in range(n)]),
        [params[i] for i in range(n)],
    )


def run_cli(case: str, tmp_path, extra=()):
    src = os.path.join(DATA, case)
    work = tmp_path / case
    shutil.copytree(src, work)
    argv = [
        "--Modelfile", "model.txt",
        "--Particlesfile", "maps.txt",
        "--Inputfile", "param.txt",
        "--OutputFile", "Output_Probabilities.tpu",
        *extra,
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__)), env.get("PYTHONPATH", "")]
    )
    # Run in-process to inherit the CPU-forced jax config from conftest.
    from bioem_tpu.cli import main

    old = os.getcwd()
    os.chdir(work)
    try:
        assert main(argv) == 0
    finally:
        os.chdir(old)
    with open(work / "Output_Probabilities.tpu") as f:
        ours = f.read()
    with open(work / "Output_Probabilities.golden") as f:
        golden = f.read()
    return ours, golden, work


@pytest.mark.skipif(not os.path.isdir(DATA), reason="goldens not generated")
def test_case_a_euler_ctf(tmp_path):
    ours, golden, _ = run_cli("case_a_euler_ctf", tmp_path)
    lp_t, c_t, par_t = parse_output(ours)
    lp_g, c_g, par_g = parse_output(golden)
    np.testing.assert_allclose(lp_t, lp_g, atol=LOGP_ATOL)
    for pt, pg in zip(par_t, par_g):
        # MaxLogProb, alpha, beta, gamma, amp, defocus, env, cx, cy, norm, mu
        np.testing.assert_allclose(pt[0], pg[0], atol=LOGP_ATOL)
        np.testing.assert_allclose(pt[1:7], pg[1:7], atol=1e-3)
        np.testing.assert_allclose(pt[7:9], pg[7:9], atol=0)  # integer centers
        np.testing.assert_allclose(pt[9:11], pg[9:11], atol=1e-3)


@pytest.mark.skipif(not os.path.isdir(DATA), reason="goldens not generated")
def test_case_b_quat_psf(tmp_path):
    ours, golden, work = run_cli(
        "case_b_quat_psf", tmp_path, extra=("--ReadOrientation", "quat.txt")
    )
    lp_t, c_t, par_t = parse_output(ours)
    lp_g, c_g, par_g = parse_output(golden)
    np.testing.assert_allclose(lp_t, lp_g, atol=LOGP_ATOL)
    for pt, pg in zip(par_t, par_g):
        np.testing.assert_allclose(pt[0], pg[0], atol=LOGP_ATOL)
        np.testing.assert_allclose(pt[1:8], pg[1:8], atol=1e-3)

    # ANG_PROB per-orientation posteriors: compare the top-K logP values.
    def ang_values(text):
        vals = {}
        for line in text.splitlines():
            m = re.match(r"\s*(\d+)\s+((?:-?\d+\.\d+\s+){4})(-?\d+\.\d+) Separated:", line)
            if m:
                vals.setdefault(int(m.group(1)), []).append(float(m.group(3)))
        return vals

    with open(work / "ANG_PROB") as f:
        ours_ang = ang_values(f.read())
    with open(work / "ANG_PROB.golden") as f:
        gold_ang = ang_values(f.read())
    assert set(ours_ang) == set(gold_ang)
    for img in gold_ang:
        np.testing.assert_allclose(
            sorted(ours_ang[img]), sorted(gold_ang[img]), atol=LOGP_ATOL
        )
