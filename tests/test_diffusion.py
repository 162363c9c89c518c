"""Diffusion suite tests: schedules, forward/reverse process identities, UNet shapes
and gradients, crop batching, and a short training-loss descent."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from thr3ed_atom_tpu.diffusion.gaussian_diffusion import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    get_named_beta_schedule,
)
from thr3ed_atom_tpu.diffusion.losses import (
    discretized_gaussian_log_likelihood,
    normal_kl,
)
from thr3ed_atom_tpu.diffusion.model import random_crop_3d_batch
from thr3ed_atom_tpu.diffusion.nn import timestep_embedding, update_ema
from thr3ed_atom_tpu.diffusion.timestep_sampler import UniformSampler
from thr3ed_atom_tpu.diffusion.unet import UNetModel


def _diffusion(T=20, loss_type=LossType.MSE, var_type=ModelVarType.FIXED_SMALL):
    return GaussianDiffusion(
        betas=get_named_beta_schedule("cosine", T),
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=var_type,
        loss_type=loss_type,
    )


# ------------------------------------------------------------------ schedules


@pytest.mark.parametrize("name", ["linear", "cosine"])
def test_beta_schedules_valid(name):
    betas = get_named_beta_schedule(name, 100)
    assert betas.shape == (100,)
    assert (betas > 0).all() and (betas <= 1).all()
    alphas_cumprod = np.cumprod(1 - betas)
    assert alphas_cumprod[-1] < 0.01  # nearly fully noised at T


def test_q_sample_endpoints(key):
    d = _diffusion(T=100)
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.zeros_like(x0)
    # t = 0: almost no noise
    x_t = d.q_sample(x0, jnp.zeros(2, jnp.int32), noise)
    np.testing.assert_allclose(np.asarray(x_t), np.sqrt(d.alphas_cumprod[0]), atol=1e-5)
    # t = T-1 with zero noise: scaled down to nearly zero
    x_T = d.q_sample(x0, jnp.full(2, 99, jnp.int32), noise)
    assert float(jnp.abs(x_T).max()) < 0.2


def test_eps_xstart_roundtrip(key):
    """predict_xstart_from_eps inverts q_sample exactly."""
    d = _diffusion(T=50)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (3, 8, 8, 2))
    eps = jax.random.normal(k2, x0.shape)
    t = jnp.array([5, 20, 45])
    x_t = d.q_sample(x0, t, eps)
    x0_rec = d._predict_xstart_from_eps(x_t, t, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_posterior_identities(key):
    d = _diffusion(T=50)
    # posterior coefficients sum appropriately: for x_start == x_t == x, mean == x
    x = jax.random.normal(key, (2, 4, 4, 1))
    t = jnp.array([10, 30])
    mean, _, _ = d.q_posterior_mean_variance(x, x, t)
    coef = d.posterior_mean_coef1 + d.posterior_mean_coef2
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(x) * coef[np.array([10, 30])][:, None, None, None],
        rtol=1e-5,
    )


def test_normal_kl_zero_for_identical():
    kl = normal_kl(1.5, 0.3, 1.5, 0.3)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_discretized_gaussian_ll_reasonable():
    ll = discretized_gaussian_log_likelihood(
        jnp.zeros((2, 4)), means=jnp.zeros((2, 4)), log_scales=jnp.full((2, 4), -5.0)
    )
    assert np.isfinite(np.asarray(ll)).all()
    # likelihood is highest at the mean
    ll_off = discretized_gaussian_log_likelihood(
        jnp.full((2, 4), 0.5), means=jnp.zeros((2, 4)), log_scales=jnp.full((2, 4), -5.0)
    )
    assert float(ll.mean()) > float(ll_off.mean())


# ------------------------------------------------------------------ sampling plumbing


def test_p_sample_loop_shape_and_finiteness(key):
    d = _diffusion(T=5)
    model_fn = lambda x, t: jnp.zeros_like(x)  # predicts eps = 0
    out = d.p_sample_loop(model_fn, (2, 4, 4, 1), key)
    assert out.shape == (2, 4, 4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_loop_deterministic(key):
    d = _diffusion(T=5)
    model_fn = lambda x, t: jnp.zeros_like(x)
    noise = jax.random.normal(key, (1, 4, 4, 1))
    a = d.ddim_sample_loop(model_fn, (1, 4, 4, 1), key, noise=noise, eta=0.0)
    b = d.ddim_sample_loop(model_fn, (1, 4, 4, 1), key, noise=noise, eta=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timestep_subsampling(key):
    d = _diffusion(T=50)
    seq = d._timestep_sequence(max_iter=10)
    assert len(seq) == 10
    assert seq[0] == 49 and seq[-1] == 0  # descending, endpoints included


def test_learned_range_variance_split(key):
    d = _diffusion(T=10, var_type=ModelVarType.LEARNED_RANGE)
    x = jax.random.normal(key, (2, 4, 4, 2))
    model_fn = lambda xx, t: jnp.concatenate([jnp.zeros_like(xx), jnp.zeros_like(xx)], -1)
    out = d.p_mean_variance(model_fn, x, jnp.array([3, 7]))
    assert out["mean"].shape == x.shape
    assert np.isfinite(np.asarray(out["log_variance"])).all()


def test_uniform_timestep_sampler(key):
    d = _diffusion(T=16)
    sampler = UniformSampler(d)
    t, w = sampler.sample(key, 512)
    assert t.shape == (512,)
    assert (np.asarray(t) >= 0).all() and (np.asarray(t) < 16).all()
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-5)  # uniform -> unit weights


# ------------------------------------------------------------------ nn / unet


def test_timestep_embedding_shape_and_range():
    emb = timestep_embedding(jnp.array([0, 10, 499]), 64)
    assert emb.shape == (3, 64)
    assert float(jnp.abs(emb).max()) <= 1.0 + 1e-6


def test_update_ema():
    ema = {"w": jnp.ones(3)}
    new = {"w": jnp.zeros(3)}
    out = update_ema(ema, new, rate=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNetModel(
        in_channels=4,
        model_channels=8,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=(),
        channel_mult=(1, 2),
        dims=3,
        num_heads=2,
        use_scale_shift_norm=True,
        use_bottleneck_attn=True,
    )
    x = jnp.zeros((2, 8, 8, 8, 4))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    return unet, params


def test_unet_forward_shape(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8, 4))
    out = unet.apply(params, x, jnp.array([1, 3]))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_unet_zero_init_output(tiny_unet):
    """Output conv is zero-initialized: a fresh UNet predicts ~0 (residual-friendly)."""
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8, 4))
    out = unet.apply(params, x, jnp.array([0]))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_unet_gradients_finite(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 8, 4))

    def loss(p):
        return jnp.mean(unet.apply(p, x, jnp.array([2])) ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


def test_unet_2d_mode():
    unet = UNetModel(
        in_channels=3, model_channels=8, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), dims=2, num_heads=2,
    )
    x = jnp.zeros((1, 16, 16, 3))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    out = unet.apply(params, x, jnp.array([1]))
    assert out.shape == x.shape


# ------------------------------------------------------------------ crops + training


def test_random_crop_3d_batch(key):
    grid = jnp.arange(10 * 10 * 10 * 2, dtype=jnp.float32).reshape(10, 10, 10, 2)
    crops = random_crop_3d_batch(key, grid, (4, 4, 4), batch_size=6)
    assert crops.shape == (6, 4, 4, 4, 2)
    # every crop is a contiguous sub-block: check values exist in the source grid
    assert float(crops.max()) <= float(grid.max())
    # crops differ (random offsets)
    assert not np.allclose(np.asarray(crops[0]), np.asarray(crops[1]))


def test_training_loss_descends(tiny_unet, key):
    """A few Adam steps on a fixed target must reduce the diffusion loss."""
    unet, params = tiny_unet
    d = _diffusion(T=10)
    x0 = jax.random.normal(key, (4, 8, 8, 8, 4)) * 0.5
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, k):
        tk, nk = jax.random.split(k)
        t = jax.random.randint(tk, (4,), 0, d.num_timesteps)

        def loss_fn(p):
            terms = d.training_losses(
                lambda x, tt: unet.apply(p, x, tt), x0, t, nk
            )
            return terms["loss"].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    k = key
    for _ in range(30):
        k, sub = jax.random.split(k)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_huber_loss_type(tiny_unet, key):
    unet, params = tiny_unet
    d = _diffusion(T=10, loss_type=LossType.HUBER)
    x0 = jax.random.normal(key, (2, 8, 8, 8, 4))
    t = jnp.array([2, 7])
    terms = d.training_losses(lambda x, tt: unet.apply(params, x, tt), x0, t, key)
    assert terms["loss"].shape == (2,)
    assert np.isfinite(np.asarray(terms["loss"])).all()


def test_model_save_load_roundtrip(tiny_unet, tmp_path):
    from thr3ed_atom_tpu.diffusion.model import Thre3inFusionModel

    unet, params = tiny_unet
    d = _diffusion(T=8)
    model = Thre3inFusionModel(unet=unet, diffusion=d)
    model.params = params
    model.density_scale_range = (-1.0, 5.0)
    model.save_model(tmp_path / "ckpt")
    assert (tmp_path / "ckpt.npz").exists() and (tmp_path / "ckpt.json").exists()

    model2 = Thre3inFusionModel(unet=unet, diffusion=d)
    model2.load_params(tmp_path / "ckpt", spatial=(8, 8, 8))
    flat1 = jax.tree_util.tree_leaves(model.params)
    flat2 = jax.tree_util.tree_leaves(model2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_utils_infinite_batches(key, tmp_path):
    import json

    from PIL import Image

    from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
    from thr3ed_atom_tpu.data.utils import get_image_transform, infinite_batches
    from thr3ed_atom_tpu.utils.camera import pose_spherical
    from thr3ed_atom_tpu.utils.constants import (
        BOUNDS, EXTRINSIC, FOCAL, HEIGHT, INTRINSIC, ROTATION, TRANSLATION, WIDTH,
    )

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    params = {}
    for i in range(3):
        name = f"x_{i}.png"
        Image.fromarray(np.full((8, 8, 3), i * 40, np.uint8)).save(img_dir / name)
        pose = pose_spherical(i * 100.0, -20.0, 4.0)
        params[name] = {
            INTRINSIC: {BOUNDS: [2, 6], HEIGHT: 8, WIDTH: 8, FOCAL: 9.0},
            EXTRINSIC: {ROTATION: pose.rotation.tolist(),
                        TRANSLATION: pose.translation.tolist()},
        }
    with open(tmp_path / "cp.json", "w") as f:
        json.dump(params, f)
    ds = PosedImagesDataset(images_dir=img_dir, camera_params_json=tmp_path / "cp.json")

    it = infinite_batches(key, ds, batch_size=4)
    images, poses = next(it)
    assert images.shape == (4, 8, 8, 3) and poses.shape == (4, 3, 4)
    images2, _ = next(it)
    assert images2.shape == (4, 8, 8, 3)

    # transform: resize + [0, 1] range
    transform = get_image_transform(new_size=(4, 4))
    out = transform(Image.fromarray(np.full((8, 8, 3), 255, np.uint8)))
    assert out.shape == (4, 4, 3)
    assert out.max() <= 1.0
