"""Why does the repack cost 8.8 ms (4x speed-of-light)? Times each sub-stage
and candidate replacements at production shapes, per march axis.

Candidates:
  A. shipped: transpose to [NP, nu, C, nv] + slice-lerp interleave
  B. transpose only (no interleave) — isolates the transpose cost
  C. channel-major layout [NP, C, nu, nv] via plain transpose (major-dims-only
     permute for axes 0/1 — the minor dim stays the minor dim)
  D. channel-major layout via identity-matrix MXU contraction (for axis 2,
     where C-major still moves the minor dim)
  E. lerp interleave as a banded [NP, nvert] matmul vs the slice/stack chain

Run: python experiments/probe_repack_cost.py [grid_size]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.rendering import gnomonic as gn
from thr3ed_atom_tpu.rendering.bricked import _uv_axes

GRID_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
P = 2


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., -1].astype(jnp.float32)))


def timed(label, fn, *args, n=20, reps=3):
    out = fn(*args)
    _sync(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label:52s} {best * 1e3:8.3f} ms", flush=True)
    return out


def lerp_matrix(nvert, P, flip):
    NP = (nvert - 1) * P + 1
    L = np.zeros((NP, nvert), np.float32)
    for j in range(NP):
        k, r = divmod(j, P)
        if r == 0:
            L[j, k] = 1.0
        else:
            L[j, k] = 1.0 - r / P
            L[j, k + 1] = r / P
    if flip:
        L = L[:, ::-1]
    return jnp.asarray(L, jnp.bfloat16)


def main():
    grid = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    pre_d, pre_f = grid.activated_grids()
    unified = jnp.concatenate([pre_f, pre_d], axis=-1)
    C = 32
    unified = jnp.pad(unified, ((0, 0),) * 3 + ((0, C - unified.shape[-1]),))
    unified = jax.block_until_ready(jax.jit(lambda x: x + 0.0)(unified))
    names = "wdh"

    for axis in (0, 1, 2):
        u_ax, v_ax = _uv_axes(axis)
        nvert = unified.shape[axis]
        print(f"--- axis={axis} (u={u_ax}, v={v_ax}) ---", flush=True)

        statics = gn.statics_for_grid(grid, axis, False, pos_per_cell=P)

        timed("A. shipped repack (P=2, bf16)",
              jax.jit(lambda g: gn.repack_position_slices(g, statics)), grid)

        timed("B. transpose only -> [a, u, C, v] bf16",
              jax.jit(lambda u: jnp.transpose(
                  u, (axis, u_ax, 3, v_ax)).astype(jnp.bfloat16)), unified)

        timed("C. transpose only -> [a, C, u, v] bf16",
              jax.jit(lambda u: jnp.transpose(
                  u, (axis, 3, u_ax, v_ax)).astype(jnp.bfloat16)), unified)

        eye = jnp.eye(unified.shape[v_ax], dtype=jnp.bfloat16)
        sub = f"wdhc,{names[v_ax]}v->{names[axis]}c{names[u_ax]}v"
        timed(f"D. eye-contraction '{sub}' bf16",
              jax.jit(lambda u: jnp.einsum(
                  sub, u.astype(jnp.bfloat16), eye,
                  preferred_element_type=jnp.bfloat16)), unified)

        vert_cm = jnp.transpose(unified, (axis, 3, u_ax, v_ax)).astype(jnp.bfloat16)
        vert_cm = jax.block_until_ready(vert_cm)
        L = lerp_matrix(nvert, P, False)
        timed("E. interleave as [NP, nvert] matmul (bf16)",
              jax.jit(lambda v: jnp.einsum(
                  "ja,acuv->jcuv", L, v,
                  preferred_element_type=jnp.bfloat16)), vert_cm)

        def slice_lerp(v):
            lo, hi = v[:-1], v[1:]
            subs = [lo] + [(1.0 - f) * lo + f * hi for f in (0.5,)]
            inter = jnp.stack(subs, axis=1).reshape((-1,) + v.shape[1:])
            return jnp.concatenate([inter, v[-1:]], axis=0)

        timed("F. interleave via slice/stack chain (bf16 in)",
              jax.jit(slice_lerp), vert_cm)


if __name__ == "__main__":
    main()
