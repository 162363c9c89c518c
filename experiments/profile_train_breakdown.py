"""Stage-level breakdown of the gnomonic TRAIN step on the real chip.

Times each differentiable stage in isolation (fwd and fwd+bwd) so the
36 ms/step budget at 128^3/400px can be attributed: repack, occupancy,
composite kernel (fused v3 vs v2), warp, Adam. Data source for the round-5
step-breakdown table in DESIGN_NOTES (VERDICT round-4 item 2).

Run: python experiments/profile_train_breakdown.py [grid_size] [image_size]
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
from thr3ed_atom_tpu.rendering import gnomonic_train as gt
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
from thr3ed_atom_tpu.utils.camera import pose_spherical

GRID_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMAGE_SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 400


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(label, fn, *args, n=15, reps=4):
    out = fn(*args)
    _sync(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label:44s} {best * 1e3:8.3f} ms", flush=True)
    return out, best


def main():
    grid = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    pose = pose_spherical(45.0, -40.0, 4.0)
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    axis, flip = dominant_axis_for_pose(rotation)
    interpret = jax.default_backend() == "cpu"
    rot_j = jnp.asarray(rotation, jnp.float32)
    org_j = jnp.asarray(np.asarray(pose.translation), jnp.float32).reshape(3)
    focal_j = jnp.float32(IMAGE_SIZE * 1.1)
    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.random((IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.float32)
    )

    for fused in (True, False):
        tstat = gt.make_gnomonic_train_statics(
            grid, axis, flip, image_height=IMAGE_SIZE, image_width=IMAGE_SIZE,
            white_bkgd=True, qb=128, interpret=interpret, fused=fused,
        )
        statics = tstat.statics
        Pn, Qn, PB, Pb = tstat.frame
        QB, Qb = gn._qb_blocks(statics, Qn)
        print(f"=== fused={fused} frame={tstat.frame} QB={QB} "
              f"NP={gn._num_positions(statics)} P={statics.pos_per_cell} ===",
              flush=True)

        # ---- repack (the fused pipeline repacks VERTEX-ONLY — interior
        # positions are lerped in VMEM by the kernels)
        rp = jax.jit(partial(gt.repack_position_slices, statics=statics,
                             round_output=True, vertex_only=fused))
        slices, _ = timed(f"repack fwd (bf16, vertex_only={fused})", rp, grid)
        rp32 = jax.jit(partial(gt.repack_position_slices, statics=statics,
                               round_output=False, vertex_only=fused))
        timed("repack fwd (f32 out)", rp32, grid)

        rp_vjp = jax.jit(
            lambda g: jax.grad(
                lambda g_: jnp.sum(
                    gt.repack_position_slices(
                        g_, statics, vertex_only=fused
                    ).astype(jnp.float32)
                )
            )(g).densities
        )
        timed("repack fwd+bwd (sum loss)", rp_vjp, grid)

        # ---- geometry + occupancy
        geo_fn = jax.jit(partial(
            gn.gnomonic_geometry, statics=statics, height=IMAGE_SIZE,
            width=IMAGE_SIZE, focal=float(focal_j),
            supersample=tstat.supersample, frame=(Pn, Qn), lite=fused,
        ))
        geo, _ = timed("geometry", geo_fn, rot_j, org_j)

        if fused:
            occ_fn = jax.jit(lambda s, gm: gn.gnomonic_occupancy_lite(
                s, gm, statics, Pn, Qn, PB, Pb, QB, Qb))
            occ, _ = timed("occupancy (lite)", occ_fn, slices, geo.geom)

            comp = jax.jit(lambda s: gt.composite_positions_fused_diff(
                s, geo.ybasis, geo.norm, geo.geom, *occ,
                statics, Pn, Qn, PB, Pb))
            state, _ = timed("composite fwd (fused)", comp, slices)
            comp_g = jax.jit(lambda s: jax.grad(
                lambda s_: jnp.sum(comp(s_)))(s))
            timed("composite fwd+bwd (fused)", comp_g, slices)
        else:
            occ_fn = jax.jit(lambda s, g: gn.gnomonic_occupancy(
                s, g.Ru, statics, PB, Pb, RvT=g.RvT if QB > 1 else None,
                QB=QB))
            occ, _ = timed("occupancy (v2)", occ_fn, slices, geo)

            ru_fn = jax.jit(gn.resample_u)
            t1, _ = timed("resample_u fwd (einsum)", ru_fn, slices, geo.Ru)

            comp = jax.jit(lambda s: gt.composite_positions_diff(
                gn.resample_u(s, geo.Ru), geo.RvT, geo.ybasis, geo.live_u,
                geo.live_v, geo.norm, geo.geom, *occ, statics, Pn, Qn, PB,
                Pb))
            state, _ = timed("u-resample+composite fwd (v2)", comp, slices)
            comp_g = jax.jit(lambda s: jax.grad(
                lambda s_: jnp.sum(comp(s_)))(s))
            timed("u-resample+composite fwd+bwd (v2)", comp_g, slices)

        # ---- warp
        warp = jax.jit(lambda st: gt._warp_to_camera(
            st, geo.xr, geo.yr, rot_j, statics, IMAGE_SIZE, IMAGE_SIZE,
            float(focal_j), tstat.supersample, True, frame=(Pn, Qn),
            warp_order=tstat.warp_order, warp_impl=tstat.warp_impl,
            warp_swap=tstat.warp_swap).colour)
        timed("warp fwd (matmul CR)", warp, state)
        warp_g = jax.jit(lambda st: jax.grad(
            lambda s_: jnp.sum(warp(s_)))(st))
        timed("warp fwd+bwd (matmul CR)", warp_g, state)

        # ---- full pipeline
        lossf = jax.jit(lambda g: gt._pose_loss(
            tstat, g, image, rot_j, org_j, focal_j)[0])
        timed("pose loss fwd", lossf, grid, n=10)
        gradf = jax.jit(lambda g: jax.grad(
            lambda g_: gt._pose_loss(tstat, g_, image, rot_j, org_j,
                                     focal_j)[0])(g).densities)
        timed("pose loss fwd+bwd", gradf, grid, n=10)

        # ---- Adam alone
        tx = optax.adam(0.03)
        opt_state = tx.init(grid)
        zg = jax.tree_util.tree_map(jnp.zeros_like, grid)

        @jax.jit
        def adam_only(g, o):
            up, o2 = tx.update(zg, o, g)
            return optax.apply_updates(g, up), o2

        timed("Adam update alone", adam_only, grid, opt_state)


if __name__ == "__main__":
    main()
