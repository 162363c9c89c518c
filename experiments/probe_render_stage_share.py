"""Attribute the BATCHED render path's per-pose chip time to its stages.

Per-stage timings from isolated dispatches carry the axon tunnel's per-call
floor and deoptimized-executable noise, and their sum (~11 ms/pose) exceeds
the batched bench's measured 5.46 ms/pose — so stage attribution must happen
INSIDE one lax.map program. This probe jits prefix programs (geometry;
+occupancy; +composite; +warp = full pipeline) over the same 16-pose stack
and reports successive differences: the honest per-stage chip time of the
production (fused v3, vertex-slices, qb=128, matmul CR warp) render path.

Run: python experiments/probe_render_stage_share.py [grid_size] [image_size]
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.rendering import gnomonic as gn
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
from thr3ed_atom_tpu.rendering.warp_matmul import warp_swap_for_pose
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
    per_pose = best * 1e3 / NPOSES
    print(f"{label:34s} {best * 1e3:8.2f} ms  ({per_pose:6.3f} ms/pose)",
          flush=True)
    return best


def main():
    grid = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    interpret = jax.default_backend() == "cpu"

    # collect NPOSES poses sharing one (axis, flip, swap) variant
    rng = np.random.default_rng(42)
    rots, orgs = [], []
    want = None
    while len(rots) < NPOSES:
        p = pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0)
        rot = np.asarray(p.rotation, np.float32).reshape(3, 3)
        axis, flip = dominant_axis_for_pose(rot)
        swap = warp_swap_for_pose(rot, axis, flip, IMAGE_SIZE, IMAGE_SIZE,
                                  IMAGE_SIZE * 1.1)
        if want is None:
            want = (axis, flip, swap)
        if (axis, flip, swap) != want:
            continue
        rots.append(rot)
        orgs.append(np.asarray(p.translation, np.float32).reshape(3))
    axis, flip, swap = want
    print(f"variant axis={axis} flip={flip} swap={swap}", flush=True)

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
    print(f"frame Pn={Pn} Qn={Qn} PB={PB} Pb={Pb} QB={QB} "
          f"NP={gn._num_positions(statics)}", flush=True)

    def over_poses(body):
        def run(rotations, origins):
            return jax.lax.map(body, (rotations, origins))
        return jax.jit(run)

    def geo_of(ro):
        # round-5: production fused path rebuilds ybasis/norm IN-KERNEL
        rot, org = ro
        return gn.gnomonic_geometry(rot, org, statics, IMAGE_SIZE, IMAGE_SIZE,
                                    focal, ss, lite=True, skip_basis=True)

    def s1(ro):
        g = geo_of(ro)
        return (jnp.sum(g.geom), g.xr[0] + g.yr[0])

    def s2(ro):
        g = geo_of(ro)
        occ = gn.gnomonic_occupancy_lite(slices, g.geom, statics, Pn, Qn, PB,
                                         Pb, QB, Qb)
        return (g.xr[0] + g.yr[0],) + tuple(jnp.sum(o) for o in occ)

    def s3(ro):
        rot, org = ro
        g = geo_of(ro)
        occ = gn.gnomonic_occupancy_lite(slices, g.geom, statics, Pn, Qn, PB,
                                         Pb, QB, Qb)
        state = gn.composite_positions_fused(slices, None, None, g.geom,
                                             statics, Pn, Qn, PB, Pb, occ,
                                             xr=g.xr, yr=g.yr)
        return jnp.sum(state)

    def s4(ro):
        rot, org = ro
        state, xr, yr = gn._march_gnomonic(slices, rot, org, statics,
                                           IMAGE_SIZE, IMAGE_SIZE, focal, ss)
        return gn._warp_to_camera(state, xr, yr, rot, statics, IMAGE_SIZE,
                                  IMAGE_SIZE, focal, ss, True,
                                  warp_order=3, warp_impl="matmul",
                                  warp_swap=swap)

    t1 = timed("geometry", over_poses(s1), rotations, origins)
    t2 = timed("+ occupancy", over_poses(s2), rotations, origins)
    t3 = timed("+ composite", over_poses(s3), rotations, origins)
    t4 = timed("+ warp+finalize (full)", over_poses(s4), rotations, origins)
    pp = 1e3 / NPOSES
    print(f"\nper-pose shares: geometry {t1 * pp:.3f} | occupancy "
          f"{(t2 - t1) * pp:.3f} | composite {(t3 - t2) * pp:.3f} | "
          f"warp+finalize {(t4 - t3) * pp:.3f} | total {t4 * pp:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
