"""End-to-end CLI: reference-format inputs → Output_Probabilities/ANG_PROB.

Exercises the full reference-compatible flow: keyword parameter file, text
model, PARTICLE-format particle file, orientation list file, output files.
"""

import os
import numpy as np
import pytest

from bioem_tpu import cli


@pytest.fixture
def workdir(tmp_path, rng, monkeypatch):
    n = 16
    # model: x y z r d
    pts = rng.uniform(-6, 6, (10, 3))
    radii = rng.uniform(1.0, 3.0, 10)
    dens = rng.uniform(40, 100, 10)
    with open(tmp_path / "model.txt", "w") as f:
        for k in range(10):
            f.write(
                f"{pts[k,0]:.4f} {pts[k,1]:.4f} {pts[k,2]:.4f} "
                f"{radii[k]:.4f} {dens[k]:.4f}\n"
            )
    # particles: PARTICLE text format %8d%8d%16.8f
    maps = rng.normal(0, 1, (2, n, n))
    with open(tmp_path / "particles.txt", "w") as f:
        for m in range(2):
            f.write(f"PARTICLE {m}\n")
            for i in range(n):
                for j in range(n):
                    f.write(f"{i:8d}{j:8d}{maps[m,i,j]:16.8f}\n")
    # parameter file
    with open(tmp_path / "param.txt", "w") as f:
        f.write(
            "# test input\n"
            "PIXEL_SIZE 1.5\n"
            f"NUMBER_PIXELS {n}\n"
            "GRIDPOINTS_ALPHA 2\n"
            "GRIDPOINTS_BETA 2\n"
            "CTF_B_ENV 2.0 100.0 2\n"
            "CTF_DEFOCUS 0.5 1.5 2\n"
            "CTF_AMPLITUDE 0.1 0.1 1\n"
            "DISPLACE_CENTER 2 1\n"
            "WRITE_PROB_ANGLES 3\n"
        )
    # orientation list file (Euler, fixed-width 12.6f)
    with open(tmp_path / "angles.txt", "w") as f:
        f.write(f"{4:12d}\n")
        for a, b, g in [(0.1, 0.2, 0.3), (-1.0, 1.5, 0.4), (2.0, 0.7, -2.0), (0.0, 0.0, 0.0)]:
            f.write(f"{a:12.6f}{b:12.6f}{g:12.6f}\n")
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_cli_grid_run(workdir):
    rc = cli.main(
        [
            "--Modelfile", "model.txt",
            "--Particlesfile", "particles.txt",
            "--Inputfile", "param.txt",
        ]
    )
    assert rc == 0
    out = open("Output_Probabilities").read()
    assert "HEADER:: NOTATION" in out
    assert "RefMap: 0 LogProb:" in out
    assert "RefMap: 1 Maximizing Param:" in out
    assert "[micro-m]" in out
    ang = open("ANG_PROB").read()
    assert "Separated:" in ang
    # 2 images × top-3 orientations
    assert sum(1 for line in ang.splitlines() if "Separated:" in line) == 6


def test_cli_orientation_list(workdir):
    rc = cli.main(
        [
            "--Modelfile", "model.txt",
            "--Particlesfile", "particles.txt",
            "--Inputfile", "param.txt",
            "--ReadOrientation", "angles.txt",
            "--OutputFile", "out2",
        ]
    )
    assert rc == 0
    out = open("out2").read()
    assert "RefMap: 0 LogProb:" in out


def test_cli_dump_roundtrip(workdir):
    rc = cli.main(
        [
            "--Modelfile", "model.txt",
            "--Particlesfile", "particles.txt",
            "--Inputfile", "param.txt",
            "--DumpMaps", "--DumpModel",
            "--OutputFile", "out_a",
        ]
    )
    assert rc == 0
    rc = cli.main(
        [
            "--Modelfile", "model.txt",
            "--Particlesfile", "particles.txt",
            "--Inputfile", "param.txt",
            "--LoadMapDump", "--LoadModelDump",
            "--OutputFile", "out_b",
        ]
    )
    assert rc == 0
    # identical inputs via dumps → identical results
    a = [l for l in open("out_a") if l.startswith("RefMap:")]
    b = [l for l in open("out_b") if l.startswith("RefMap:")]
    assert a == b


def test_cli_print_best_map(workdir):
    with open("best.txt", "w") as f:
        f.write(
            "PIXEL_SIZE 1.5\nNUMBER_PIXELS 16\n"
            "BEST_ALPHA 0.1\nBEST_BETA 0.2\nBEST_GAMMA 0.3\n"
            "BEST_CTF_B_ENV 10.0\nBEST_CTF_DEFOCUS 1.0\nBEST_CTF_AMP 0.1\n"
            "BEST_DX 1\nBEST_DY -1\nBEST_NORM 2.0\nBEST_OFFSET 0.5\n"
        )
    rc = cli.main(
        ["--Modelfile", "model.txt", "--PrintBestCalMap", "best.txt"]
    )
    assert rc == 0
    content = open("BESTMAP").read()
    assert "\nMAP " in content and "MAPddx" in content


def test_cli_missing_mandatory(workdir, capsys):
    rc = cli.main(["--Modelfile", "model.txt"])
    assert rc == 1


def test_cli_refine_flag(workdir):
    """--Refine (framework extension) writes Output_Refined with one line
    per image, refined logpro >= seed, unit quaternions."""
    rc = cli.main(
        [
            "--Modelfile", "model.txt",
            "--Particlesfile", "particles.txt",
            "--Inputfile", "param.txt",
            "--ReadOrientation", "angles.txt",
            "--Refine",
        ]
    )
    assert rc == 0
    assert os.path.exists("Output_Refined")
    lines = [
        ln for ln in open("Output_Refined").read().splitlines()
        if ln.startswith("RefMap:")
    ]
    assert len(lines) == 2
    for ln in lines:
        toks = ln.split()
        lp_seed = float(toks[3])
        lp_ref = float(toks[5])
        assert lp_ref >= lp_seed
        q = np.array([float(t) for t in toks[7:11]])
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-6)


def test_refine_skipped_multihost(workdir, monkeypatch, capsys):
    """--Refine in a multi-host run must skip loudly, not crash after the
    main compute (advisor r3: refine_results raises NotImplementedError
    when process_count > 1)."""
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    rc = cli.main(
        [
            "--Modelfile", "model.txt", "--Particlesfile", "particles.txt",
            "--Inputfile", "param.txt", "--OutputFile", "out_mh.txt",
            "--Refine",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "skipping refinement" in out
    assert os.path.exists("out_mh.txt")
    assert not os.path.exists("Output_Refined")
