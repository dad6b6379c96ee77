"""On-device golden-accuracy probe across engine configs (any backend).

Round-5 tool: runs a golden case through the CLI under a matrix of kernel
configurations and reports max |Δlog P| against BOTH the f32 reference
golden and the full-double (BIOEM_USE_DOUBLE) reference golden — the
external f64 ground truth. This is how the round-5 TPU accuracy bug
(default-precision bf16 rotation matmuls flipping pixel snaps — see
ROUND5.md) was localized and its fix confirmed on device: every config
must read ~0.077 vs f32 / ~5e-4 vs f64 at case_n_n224; a config-dependent
or ~0.1-scale reading means a backend numerics regression.

Accuracy is valid even on a throughput-degraded device (degradation
affects speed only — verified round 4), so this needs no health gate.

Usage:
    tools/with_tpu.sh python tools/accuracy_probe.py [case]   # TPU
    python tools/accuracy_probe.py [case] --cpu               # host
"""

import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

CASE = next((a for a in sys.argv[1:] if not a.startswith("-")), "case_n_n224")
DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "data", CASE,
)

CONFIGS = {
    "xla-path      ": {"BIOEM_TPU_PALLAS": "0"},
    "pallas-hybrid ": {"BIOEM_TPU_PALLAS": "1", "BIOEM_TPU_FUSED_LSE": "0",
                       "BIOEM_TPU_PALLAS_IMG_TILE": "64",
                       "BIOEM_TPU_ORIENT_BLOCK": "16"},
    "pallas-fused  ": {"BIOEM_TPU_PALLAS": "1", "BIOEM_TPU_FUSED_LSE": "1",
                       "BIOEM_TPU_PALLAS_IMG_TILE": "64",
                       "BIOEM_TPU_ORIENT_BLOCK": "16"},
    "fused-batched ": {"BIOEM_TPU_PALLAS": "1", "BIOEM_TPU_FUSED_LSE": "1",
                       "BIOEM_TPU_FUSED_BATCHED": "1",
                       "BIOEM_TPU_PALLAS_IMG_TILE": "64",
                       "BIOEM_TPU_ORIENT_BLOCK": "16"},
    "raw-log1p     ": {"BIOEM_TPU_PALLAS": "0",
                       "BIOEM_TPU_ACCURATE_LOG1P": "0"},
    "masked-split  ": {"BIOEM_TPU_PALLAS": "1", "BIOEM_TPU_FUSED_LSE": "0",
                       "BIOEM_TPU_PALLAS_IMG_TILE": "64",
                       "BIOEM_TPU_ORIENT_BLOCK": "16",
                       "BIOEM_TPU_SPLIT": "masked"},
}


def parse(text):
    vals = {}
    for line in text.splitlines():
        m = re.match(r"RefMap: (\d+) LogProb:\s+(\S+)", line)
        if m:
            vals[int(m.group(1))] = float(m.group(2))
    return np.array([vals[i] for i in range(len(vals))])


def main() -> int:
    from bioem_tpu.cli import main as cli_main

    maps_file = "maps.txt" if os.path.exists(
        os.path.join(DATA, "maps.txt")
    ) else "maps.mrc"
    extra = (
        ["--ReadOrientation", "euler.txt"]
        if os.path.exists(os.path.join(DATA, "euler.txt"))
        else []
    )
    g64_path = os.path.join(DATA, "Output_Probabilities.f64.golden")
    worst = 0.0
    for tag, env in CONFIGS.items():
        for k in list(os.environ):
            if k.startswith("BIOEM_TPU_"):
                del os.environ[k]
        os.environ.update(env)
        os.environ["BIOEM_TPU_AUTOTUNE"] = "0"
        with tempfile.TemporaryDirectory() as td:
            work = os.path.join(td, "case")
            shutil.copytree(DATA, work)
            old = os.getcwd()
            os.chdir(work)
            try:
                cli_main([
                    "--Modelfile", "model.txt", "--Particlesfile", maps_file,
                    "--Inputfile", "param.txt", "--OutputFile", "out.probe",
                    *extra,
                ])
                ours = parse(open("out.probe").read())
                g32 = parse(open("Output_Probabilities.golden").read())
                g64 = (
                    parse(open("Output_Probabilities.f64.golden").read())
                    if os.path.exists("Output_Probabilities.f64.golden")
                    else None
                )
            finally:
                os.chdir(old)
        d32 = np.abs(ours - g32).max()
        line = f"{tag}: |d| vs f32 golden = {d32:.4f}"
        if g64 is not None:
            d64 = np.abs(ours - g64).max()
            line += f"  vs f64 truth = {d64:.4f}"
            worst = max(worst, d64)
        print(line, flush=True)
    print("PROBE DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
