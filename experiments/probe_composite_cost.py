"""What dominates the fused composite kernel's 3.1 ms/pose?

Runs composite_positions_fused inside the same 16-pose lax.map as the
stage-share probe under three occupancy regimes:

  dead  — all-zero occupancy: every grid step skips its body; what remains is
          grid-step overhead + the vertex-slice block DMA the index maps
          force regardless of pl.when
  real  — gnomonic_occupancy_lite on the converged blob scene (the bench's
          ~5%-occupied regime)
  full  — all-ones occupancy: every position u-resamples and every
          (j, qb) block composites

real-dead = the occupancy-gated compute actually paid; full-real = the
compute the skip rule saves; dead = the floor that only DMA/grid surgery can
cut. Run: python experiments/probe_composite_cost.py [grid] [image]
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
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
from thr3ed_atom_tpu.utils.camera import pose_spherical

GRID_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMAGE_SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 400
NPOSES = 16


def timed(label, fn, *args, reps=6):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / 3)
    print(f"{label:38s} {best * 1e3:8.2f} ms  "
          f"({best * 1e3 / NPOSES:6.3f} ms/pose)", flush=True)
    return best


def main():
    grid = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(42)
    rots, orgs = [], []
    want = None
    while len(rots) < NPOSES:
        p = pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0)
        rot = np.asarray(p.rotation, np.float32).reshape(3, 3)
        axis, flip = dominant_axis_for_pose(rot)
        if want is None:
            want = (axis, flip)
        if (axis, flip) != want:
            continue
        rots.append(rot)
        orgs.append(np.asarray(p.translation, np.float32).reshape(3))
    axis, flip = want

    statics = gn.statics_for_grid(grid, axis, flip, interpret=interpret,
                                  qb=128)
    ss = gn.effective_supersample(1.25, statics, IMAGE_SIZE, IMAGE_SIZE)
    focal = jnp.float32(IMAGE_SIZE * 1.1)
    slices = gn._repack_jit(grid, statics, True,
                            gn.use_fused_composite(statics))
    rotations = jnp.asarray(np.stack(rots))
    origins = jnp.asarray(np.stack(orgs))
    Pn, Qn, PB, Pb = gn.gnomonic_frame(None, IMAGE_SIZE, IMAGE_SIZE,
                                       float(focal), ss, statics)
    QB, Qb = gn._qb_blocks(statics, Qn)
    NP = gn._num_positions(statics)
    print(f"frame Pn={Pn} Qn={Qn} PB={PB} Pb={Pb} QB={QB} NP={NP}", flush=True)

    def program(mode):
        def one(ro):
            rot, org = ro
            g = gn.gnomonic_geometry(rot, org, statics, IMAGE_SIZE,
                                     IMAGE_SIZE, focal, ss, lite=True)
            occ = gn.gnomonic_occupancy_lite(slices, g.geom, statics, Pn, Qn,
                                             PB, Pb, QB, Qb)
            if mode == "dead":
                occ = tuple(jnp.zeros_like(o) for o in occ)
            elif mode == "full":
                occ = tuple(jnp.ones_like(o) for o in occ)
            state = gn.composite_positions_fused(slices, g.ybasis, g.norm,
                                                 g.geom, statics, Pn, Qn, PB,
                                                 Pb, occ)
            return jnp.sum(state)

        return jax.jit(lambda r, o: jax.lax.map(one, (r, o)))

    if gn._KPROF:
        # kernel-variant mode (GN_KERNEL_PROFILE): real occupancy only — the
        # variant-vs-base delta attributes the gated compute
        timed(f"composite, variant={gn._KPROF}", program("real"), rotations,
              origins)
        return
    t_dead = timed("composite, occupancy=DEAD", program("dead"), rotations,
                   origins)
    t_real = timed("composite, occupancy=real", program("real"), rotations,
                   origins)
    t_full = timed("composite, occupancy=FULL", program("full"), rotations,
                   origins)
    # pos_needed/pos_any statistics of the real occupancy at pose 0
    g0 = gn.gnomonic_geometry(rotations[0], origins[0], statics, IMAGE_SIZE,
                              IMAGE_SIZE, focal, ss, lite=True)
    cl, pn, pa = gn.gnomonic_occupancy_lite(slices, g0.geom, statics, Pn, Qn,
                                            PB, Pb, QB, Qb)
    print(f"real occupancy: pos_any {float(jnp.mean((pa > 0) * 1.0)):.2%}, "
          f"pos_needed {float(jnp.mean((pn > 0) * 1.0)):.2%}, cell_live "
          f"{float(jnp.mean((cl > 0) * 1.0)):.2%}", flush=True)
    pp = 1e3 / NPOSES
    print(f"per-pose: dead {t_dead * pp:.3f} | real {t_real * pp:.3f} | "
          f"full {t_full * pp:.3f} ms — gated compute "
          f"{(t_real - t_dead) * pp:.3f}, skip saves "
          f"{(t_full - t_real) * pp:.3f}", flush=True)


if __name__ == "__main__":
    main()
