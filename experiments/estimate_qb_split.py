"""Estimate the work saved by splitting the gnomonic composite grid's Q axis.

The shipped composite kernel runs grid=(PB, NP) with blocks [Pb, Qn] — full
v-height stripes. Occupancy (pos_needed) and early exit (max T < eps) both act
at that stripe grain, so a stripe that mixes blob and white background (where
T stays 1 forever) never exits and always pays the matmul. This script
simulates the same skip rules at finer q-block grains WITHOUT running the
kernel: it composites per-texel transmittance with plain jnp at a reduced
frame, then counts, for each candidate (Pb, Qb) blocking, the fraction of
(pb, qb, j) steps that survive (a) the exact-zero occupancy rule and (b) the
early-exit rule — i.e. the kernel-step work that a qb-split kernel would do
relative to the shipped one.

Run on CPU: python experiments/estimate_qb_split.py [grid_size frame_size]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from make_synthetic_dataset import make_blob_scene  # noqa: E402
from thr3ed_atom_tpu.rendering import gnomonic as gn  # noqa: E402
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose  # noqa: E402
from thr3ed_atom_tpu.utils.camera import pose_spherical  # noqa: E402

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 64
FRAME = int(sys.argv[2]) if len(sys.argv) > 2 else 200
EXIT_EPS = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4  # 0 = occupancy only


def main():
    grid = make_blob_scene(grid_size=GRID, seed=3, converged=True)
    rng = np.random.default_rng(42)
    results = []
    for pose_i in range(6):
        pose = pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0)
        rotation = np.asarray(pose.rotation).reshape(3, 3)
        origin = jnp.asarray(np.asarray(pose.translation).reshape(3))
        axis, flip = dominant_axis_for_pose(rotation)
        statics = gn.statics_for_grid(
            grid, axis=axis, flip=flip, pos_per_cell=2, interpret=True,
        )
        focal = FRAME * 1.1
        Pn, Qn, PB, Pb = gn.gnomonic_frame(None, FRAME, FRAME, focal, 1.25,
                                           statics)
        geo = gn.gnomonic_geometry(jnp.asarray(rotation), origin, statics,
                                   FRAME, FRAME, focal, 1.25)
        slices = gn.repack_position_slices(grid, statics)
        NP = slices.shape[0]
        sig_pl = slices[:, :, 3 * statics.ncoeff, :]  # [NP, nu, nv]

        # --- per-texel transmittance profile (plain jnp composite) ---------
        t1 = gn.resample_u(slices, geo.Ru)  # [NP, C, Pn, nv]
        sig_t = jnp.einsum(  # [NP, Pn, Qn] density at texel crossings
            "jpv,jvq->jpq",
            t1[:, 3 * statics.ncoeff].astype(jnp.float32),
            geo.RvT.astype(jnp.float32),
        )
        live = geo.live_u[:, :, 0][:, :, None] * geo.live_v  # [NP, Pn, Qn]
        sa, sb = sig_t[:-1], sig_t[1:]
        # relu-trapezoid integral between crossings (sigma linear in t)
        num = jnp.maximum(sa, 0.0) ** 2 - jnp.maximum(sb, 0.0) ** 2
        den = jnp.where(jnp.abs(sa - sb) > 1e-12, sa - sb, 1.0)
        integ = jnp.where(
            jnp.abs(sa - sb) > 1e-12, 0.5 * num / den,
            jnp.maximum(0.5 * (sa + sb), 0.0),
        )
        integ = integ * live[1:] * live[:-1]
        delta = geo.geom[1:, 1, None, None] * geo.norm[None]
        alpha = 1.0 - jnp.exp(-integ * delta)
        # T AFTER cell ending at position j (cell j spans positions j-1, j)
        T = jnp.cumprod(1.0 - alpha, axis=0)  # [NP-1, Pn, Qn]
        T = jnp.concatenate([jnp.ones((1, Pn, Qn)), T], axis=0)  # [NP, Pn, Qn]
        # the kernel gates step j on the PRE-cell transmittance (state before
        # compositing cell j), i.e. T[j-1]
        T_pre = jnp.concatenate([T[:1], T[:-1]], axis=0)

        # --- occupancy flags at (pb, qb, j) grain --------------------------
        col_live = sig_pl > 0.0  # [NP, nu, nv]
        sup_u = (geo.Ru > 0).astype(jnp.float32).reshape(
            NP, PB, Pb, -1).sum(2)  # [NP, PB, nu] (QBf-independent)
        pose_costs = {}
        for QBf in (1, 2, 4, 8):
            Qb = Qn // QBf
            sup_v = (geo.RvT > 0).astype(jnp.float32).reshape(
                NP, -1, QBf, Qb).sum(3)  # [NP, nv, QBf]
            uq = jnp.einsum("juv,jvq->juq", col_live.astype(jnp.float32),
                            sup_v)  # [NP, nu, QBf]
            slab = jnp.einsum("jbu,juq->jbq", sup_u, uq) > 0  # [NP, PB, QBf]
            z = jnp.zeros_like(slab[:1])
            prev_l = jnp.concatenate([z, slab[:-1]], 0)
            next_l = jnp.concatenate([slab[1:], z], 0)
            pos_needed = prev_l | slab | next_l  # [NP, PB, QBf]

            # early exit: block (pb, qb) stops once max pre-cell T in it < eps
            Tb = T_pre.reshape(NP, PB, Pb, QBf, Qb).max(axis=(2, 4))
            alive = Tb > EXIT_EPS  # [NP, PB, QBf]

            work = pos_needed & alive  # steps actually executed
            # matmul cost per step scales with Qb = Qn/QBf (stripe-equiv units)
            cost = float(jnp.sum(work)) / QBf
            nsteps = float(jnp.sum(work))  # grid steps (fixed-cost units)
            pose_costs[QBf] = (cost, nsteps)
            base = pose_costs[1][0]
            print(f"pose {pose_i} axis={axis} flip={flip} QBf={QBf}: "
                  f"matmul-work={cost:10.1f} stripe-equiv  "
                  f"steps={nsteps:8.0f}  ratio={cost / max(base, 1):.3f}",
                  flush=True)
        results.append(pose_costs)

    print("\nmean vs shipped stripes (matmul ratio | step-count ratio):")
    for qbf in (1, 2, 4, 8):
        mr = np.mean([pc[qbf][0] / max(pc[1][0], 1) for pc in results])
        sr = np.mean([pc[qbf][1] / max(pc[1][1], 1) for pc in results])
        print(f"  QBf={qbf}: matmul x{mr:.3f}   grid-steps x{sr:.3f}")


if __name__ == "__main__":
    main()
