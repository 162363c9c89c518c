"""Does training through the hull-clamped Catmull-Rom warp hurt convergence?

The clamp (gnomonic.py _warp_to_camera) zeroes the cubic's gradient wherever
its output exceeds the bilinear tap hull — typically at silhouette edges,
exactly where reconstruction needs gradients. This probe trains the same tiny
scene toward exact-renderer targets with warp_order 1 (bilinear) vs 3
(clamped Catmull-Rom) at matched everything else, plus a k-pose accumulation
A/B (view-level gradient noise), and reports heldout PSNR measured with the
EXACT renderer (so the eval warp cancels).

CPU, interpret mode:  python experiments/probe_train_warp_order.py [steps]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")


import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from thr3ed_atom_tpu.models.voxels import VoxelGrid, VoxelSize  # noqa: E402
from thr3ed_atom_tpu.rendering import gnomonic_train as gt  # noqa: E402
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose  # noqa: E402
from thr3ed_atom_tpu.rendering.renderer import (  # noqa: E402
    SHVoxGridRenderConfig,
    render_sh_voxel_grid,
)
from thr3ed_atom_tpu.rendering.rays import cast_rays, flatten_rays  # noqa: E402
from thr3ed_atom_tpu.utils.camera import (  # noqa: E402
    CameraBounds,
    CameraIntrinsics,
    pose_spherical,
)

_num_args = [a for a in sys.argv[1:] if not a.startswith("-")]
STEPS = int(_num_args[0]) if _num_args else 150
N = 16
H = W = 32
FOCAL = 36.0
NVIEW = 12


def exact_images(grid, poses, intr):
    cfg = SHVoxGridRenderConfig(
        num_samples_per_ray=256, camera_bounds=CameraBounds(1.5, 6.0),
        perturb_sampled_points=False, white_bkgd=True,
    )
    outs = []
    for p in poses:
        rays = flatten_rays(cast_rays(intr, p))
        out = render_sh_voxel_grid(grid, rays, cfg)
        outs.append(np.asarray(out.colour).reshape(H, W, 3))
    return outs


def main():
    key = jax.random.PRNGKey(5)
    kd, kf, kt = jax.random.split(key, 3)
    # ground-truth scene: a blob with SH detail
    coords = jnp.stack(jnp.meshgrid(*[jnp.arange(N)] * 3, indexing="ij"), -1)
    dist = jnp.linalg.norm(coords - (N - 1) / 2.0, axis=-1, keepdims=True)
    dens = jnp.where(dist < N * 0.33, 4.0 + jax.random.normal(kd, (N, N, N, 1)),
                     -1.0)
    feats = jax.random.normal(kf, (N, N, N, 27)) * 0.4
    gt_grid = VoxelGrid(
        densities=dens, features=feats,
        voxel_size=VoxelSize(2.0 / N, 2.0 / N, 2.0 / N),
        density_postactivation="relu",
    )
    intr = CameraIntrinsics(H, W, FOCAL)
    rng = np.random.default_rng(0)
    # one march variant so a single compiled step serves every view
    poses = [pose_spherical(20.0 + 50.0 * i / NVIEW, -35.0 + 8.0 * (i % 3), 3.5)
             for i in range(NVIEW)]
    variants = {dominant_axis_for_pose(np.asarray(p.rotation).reshape(3, 3))
                for p in poses}
    assert len(variants) == 1, variants
    axis, flip = variants.pop()
    targets = exact_images(gt_grid, poses, intr)
    heldout = [pose_spherical(37.0, -31.0, 3.5), pose_spherical(52.0, -39.0, 3.5)]
    heldout_gt = exact_images(gt_grid, heldout, intr)

    rotations = jnp.asarray(np.stack(
        [np.asarray(p.rotation).reshape(3, 3) for p in poses]), jnp.float32)
    origins = jnp.asarray(np.stack(
        [np.asarray(p.translation).reshape(3) for p in poses]), jnp.float32)
    images = jnp.asarray(np.stack(targets))

    def train(warp_order, kacc, jitter=False):
        init = VoxelGrid(
            densities=jax.random.uniform(kt, (N, N, N, 1), minval=-1.0,
                                         maxval=1.0),
            features=jnp.zeros((N, N, N, 27)),
            voxel_size=VoxelSize(2.0 / N, 2.0 / N, 2.0 / N),
            density_postactivation="relu",
        )
        tstat = gt.make_gnomonic_train_statics(
            init, axis, flip, image_height=H, image_width=W, white_bkgd=True,
            apply_diffuse_render_regularization=True, pos_per_cell=2,
            warp_order=warp_order, interpret=True,
        )
        tx = optax.adam(0.03)
        g, opt = init, tx.init(init)
        picker = np.random.default_rng(7)
        import jax as _jax
        for s in range(STEPS):
            idx = picker.choice(NVIEW, size=kacc, replace=False)
            if kacc == 1:
                i = int(idx[0])
                step_key = _jax.random.PRNGKey(s) if jitter else None
                g, opt, m = gt.gnomonic_train_step(
                    tstat, tx, g, opt, images[i], rotations[i], origins[i],
                    jnp.float32(FOCAL), step_key)
            else:
                j = jnp.asarray(idx)
                g, opt, m = gt.gnomonic_train_step_multi(
                    tstat, tx, g, opt, images[j], rotations[j], origins[j],
                    jnp.float32(FOCAL))
        # heldout PSNR through the EXACT renderer (eval warp cancels)
        outs = exact_images(g, heldout, intr)
        mses = [float(np.mean((o - t) ** 2)) for o, t in zip(outs, heldout_gt)]
        psnr = float(np.mean([10 * np.log10(1.0 / max(m, 1e-12)) for m in mses]))
        print(f"warp_order={warp_order} k={kacc} jitter={jitter}: "
              f"heldout {psnr:.3f} dB "
              f"(final step loss {float(m['total_loss']):.4f})", flush=True)
        return psnr

    if "--jitter" in sys.argv:
        train(3, 1, jitter=False)
        train(3, 1, jitter=True)
    else:
        for kacc in (1, 4):
            for order in (1, 3):
                train(order, kacc)


if __name__ == "__main__":
    main()
