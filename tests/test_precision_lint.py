"""Static guard: no default-precision contractions on the compute path.

JAX's default matmul precision is bf16 on TPU; round 5's root-caused
accuracy bug was an unqualified ``points @ rotmat.T`` whose ~4e-3-relative
coordinate error flipped pixel snaps wholesale (ROUND5.md). The CPU suite
cannot catch a reintroduction (CPU default is full f32), so this test
enforces the rule STATICALLY over the device-code modules:

* the bare ``@`` operator (ast.MatMult) is forbidden — use
  ``jnp.matmul(..., precision=...)`` so intent is explicit;
* every ``jnp.dot`` / ``jnp.matmul`` / ``jnp.einsum`` call must pass a
  ``precision=`` keyword, except inside Pallas kernels (``ops/``) where
  operands are already explicitly bf16-split and accumulation is pinned
  via ``preferred_element_type``.
"""

import ast
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..", "bioem_tpu")

# Device-code modules where contractions feed results. Host-side/NumPy
# modules (io/, simulator, params, cli, debug_prob) are exempt: numpy has
# no precision knob and runs f64-capable host arithmetic.
CHECKED = [
    "core/posterior.py",
    "core/projection.py",
    "core/engine.py",
    "core/ctf.py",
    "core/orientations.py",
    "parallel/mesh.py",
    "parallel/distributed.py",
    "refine.py",
    "stream.py",
]

# In-kernel dots: operands are hand-split bf16 by design; the precision=
# kwarg is meaningless there (Mosaic takes preferred_element_type).
KERNEL_MODULES = ["ops/compare_pallas.py", "ops/project_pallas.py"]

CONTRACTION_FUNCS = {"dot", "matmul", "einsum", "tensordot"}


def _contraction_calls_without_precision(tree):
    bad = []
    for node in ast.walk(tree):
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.MatMult):
            bad.append((node.lineno, "bare @ operator"))
        if isinstance(node, ast.Call):
            func = node.func
            name = None
            if isinstance(func, ast.Attribute):
                name = func.attr
            elif isinstance(func, ast.Name):
                name = func.id
            if name in CONTRACTION_FUNCS:
                kws = {k.arg for k in node.keywords}
                if "precision" not in kws and not (kws & {None}):
                    # functools.partial(jnp.einsum, precision=hi) wrappers
                    # produce Name calls like ein(...) — those resolve to
                    # a partial carrying precision; only flag direct
                    # jnp/np attribute calls.
                    if isinstance(func, ast.Attribute) and isinstance(
                        func.value, ast.Name
                    ) and func.value.id in ("jnp", "jax", "lax"):
                        bad.append((node.lineno, f"{name}() without precision="))
    return bad


@pytest.mark.parametrize("rel", CHECKED)
def test_no_default_precision_contractions(rel):
    path = os.path.join(ROOT, rel)
    with open(path) as f:
        tree = ast.parse(f.read(), filename=rel)
    bad = _contraction_calls_without_precision(tree)
    assert not bad, (
        f"{rel}: default-precision contraction(s) {bad} — on TPU these run "
        "bf16; pin precision=jax.lax.Precision.HIGHEST (see ROUND5.md)"
    )


@pytest.mark.parametrize("rel", KERNEL_MODULES)
def test_kernel_dots_pin_accumulator(rel):
    """Kernel modules may skip precision= but every dot must pin its
    accumulator dtype explicitly."""
    path = os.path.join(ROOT, rel)
    src = open(path).read()
    tree = ast.parse(src, filename=rel)
    for node in ast.walk(tree):
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.MatMult):
            raise AssertionError(f"{rel}:{node.lineno}: bare @ in kernel module")
    # Every partial(jnp.dot, ...) wrapper must carry preferred_element_type.
    for lineno, line in enumerate(src.splitlines(), 1):
        if "partial(jnp.dot" in line:
            assert "preferred_element_type" in line, (rel, lineno, line)
