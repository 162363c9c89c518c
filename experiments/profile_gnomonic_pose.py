"""Per-stage breakdown of the gnomonic shear-warp pipeline on the real chip.

Times each render stage in isolation (repack, geometry, u-resample, occupancy,
composite kernel, warp) plus the fused whole-pose train step split into
forward / forward+backward / full step (+Adam). This is the data source for
the DESIGN_NOTES step-breakdown table (VERDICT round-2 item 2).

Run:  python experiments/profile_gnomonic_pose.py [grid_size] [P]
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
import optax

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.rendering import gnomonic as gn
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
from thr3ed_atom_tpu.rendering.gnomonic_train import (
    _pose_loss,
    gnomonic_train_step,
    make_gnomonic_train_statics,
)
from thr3ed_atom_tpu.utils.camera import pose_spherical

GRID_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
P = int(sys.argv[2]) if len(sys.argv) > 2 else 0  # 0 = auto
IMAGE_SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 400
QBW = int(sys.argv[4]) if len(sys.argv) > 4 else 0  # gnomonic_qb (q-split)


def _sync(out):
    # jax.block_until_ready does NOT block under the axon tunnel (see
    # DESIGN_NOTES); force completion by pulling a device-reduced scalar
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(label, fn, *args, n=20, reps=4):
    out = fn(*args)
    _sync(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label:34s} {best * 1e3:8.3f} ms", flush=True)
    return out, best


def main():
    grid = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    pose = pose_spherical(45.0, -40.0, 4.0)
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    axis, flip = dominant_axis_for_pose(rotation)
    interpret = jax.default_backend() == "cpu"
    statics = gn.statics_for_grid(grid, axis, flip, pos_per_cell=P,
                                  interpret=interpret, qb=QBW)
    ss = gn.DEFAULT_SUPERSAMPLE
    H = W = IMAGE_SIZE
    focal = IMAGE_SIZE * 1.1
    Pn, Qn, PB, Pb = gn.gnomonic_frame(None, H, W, focal, ss, statics)
    QB, _ = gn._qb_blocks(statics, Qn)
    print(
        f"grid {GRID_SIZE}^3  image {IMAGE_SIZE}^2  P={statics.pos_per_cell} "
        f"ss={ss}  texels {Pn}x{Qn}  positions {gn._num_positions(statics)}  "
        f"qb={QBW} (QB={QB})",
        flush=True,
    )
    rot_j = jnp.asarray(rotation, jnp.float32)
    org_j = jnp.asarray(np.asarray(pose.translation), jnp.float32).reshape(3)

    # --- render stages ---
    slices, _ = timed("repack_position_slices", gn._repack_jit, grid, statics)

    geo_fn = jax.jit(
        partial(gn.gnomonic_geometry, statics=statics, height=H, width=W,
                focal=focal, supersample=ss)
    )
    geo, _ = timed("gnomonic_geometry", geo_fn, rot_j, org_j)

    t1, _ = timed("resample_u (einsum)", jax.jit(gn.resample_u), slices, geo.Ru)

    occ_fn = jax.jit(lambda s, g: gn.gnomonic_occupancy(
        s, g.Ru, statics, PB, Pb, RvT=g.RvT if QB > 1 else None, QB=QB))
    occ, _ = timed("gnomonic_occupancy", occ_fn, slices, geo)

    comp_fn = jax.jit(
        lambda t1_, g, o: gn.composite_positions(
            t1_, g.RvT, g.ybasis, g.live_u, g.live_v, g.norm, g.geom,
            statics, Pn, Qn, PB, Pb, occupancy=o,
        )
    )
    state, _ = timed("composite kernel", comp_fn, t1, geo, occ)

    warp_fn = jax.jit(
        lambda st, g, r: gn._warp_to_camera(
            st, g.xr, g.yr, r, statics, H, W, focal, ss, True, warp_order=3
        )
    )
    timed("warp (Catmull-Rom)", warp_fn, state, geo, rot_j)

    march_fn = partial(
        gn._march_gnomonic, statics=statics, height=H, width=W, focal=focal,
        supersample=ss,
    )
    slices_m = slices
    if gn.use_fused_composite(statics):
        slices_m, _ = timed("repack (vertex_only, fused path)",
                            gn._repack_jit, grid, statics, True, True)
    timed("full march (fused jit)", lambda s, r, o: march_fn(s, r, o),
          slices_m, rot_j, org_j)

    # --- train step ---
    print("--- train (whole-pose) ---", flush=True)
    tstat = make_gnomonic_train_statics(
        grid, axis, flip, image_height=H, image_width=W, white_bkgd=True,
        pos_per_cell=statics.pos_per_cell, interpret=interpret, qb=QBW,
    )
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    focal_j = jnp.float32(focal)

    fwd = jax.jit(lambda g: _pose_loss(tstat, g, image, rot_j, org_j, focal_j)[0])
    timed("forward (loss only)", fwd, grid, n=10)

    fwdbwd = jax.jit(
        lambda g: jax.value_and_grad(partial(_pose_loss, tstat), has_aux=True)(
            g, image, rot_j, org_j, focal_j
        )[1]
    )
    timed("forward+backward", fwdbwd, grid, n=10)

    tx = optax.adam(0.03)
    state_d = {"g": grid, "o": tx.init(grid)}

    def full_step(_):
        state_d["g"], state_d["o"], m = gnomonic_train_step(
            tstat, tx, state_d["g"], state_d["o"], image, rot_j, org_j, focal_j
        )
        return m["total_loss"]

    _, t_step = timed("full step (+Adam)", full_step, 0, n=10)
    rays = H * W
    print(f"train throughput at this pose: {rays / t_step / 1e6:.2f} M rays/s",
          flush=True)


if __name__ == "__main__":
    main()
