"""Gaussian diffusion (DDPM + DDIM) in pure JAX.

Parity: reference thre3d_elements/thre3infusion/gaussian_diffusion.py (OpenAI
guided-diffusion lineage): beta schedules :19-65, mean/var/loss enums :68-103,
precomputed schedule arrays :143-180, q_sample :199, q_posterior :219,
p_mean_variance :243, p_sample(_loop) :441-608, DDIM :610-780, classifier guidance
:402-439, VLB terms :782, training_losses :817 (incl. the Huber variant :1019-1033),
calc_bpd_loop :945.

TPU-native re-design: the reverse-process loops are ``jax.lax.scan`` over a static
number of steps with explicit PRNG keys (one compiled program, no per-step dispatch);
the model is a pure function ``model_fn(x, t) -> out`` with parameters bound outside;
schedules are precomputed in float64 numpy and embedded as constants.
"""
import enum
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from thr3ed_atom_tpu.diffusion.losses import (
    discretized_gaussian_log_likelihood,
    normal_kl,
)
from thr3ed_atom_tpu.diffusion.nn import mean_flat


# ------------------------------------------------------------------- beta schedules


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999):
    """Betas such that cumprod(1 - beta) follows ``alpha_bar`` (reference :48-65)."""
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def get_named_beta_schedule(
    schedule_name: str,
    num_diffusion_timesteps: int,
    beta_start_unscaled: float = 0.0001,
    beta_end_unscaled: float = 0.02,
) -> np.ndarray:
    """'linear' (scaled to the timestep count) or 'cosine' (reference :19-45)."""
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * beta_start_unscaled,
            scale * beta_end_unscaled,
            num_diffusion_timesteps,
            dtype=np.float64,
        )
    if schedule_name == "cosine":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


# ------------------------------------------------------------------------ enums


class ModelMeanType(enum.Enum):
    PREVIOUS_X = enum.auto()  # model predicts x_{t-1}
    START_X = enum.auto()  # model predicts x_0
    EPSILON = enum.auto()  # model predicts the noise


class ModelVarType(enum.Enum):
    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()
    HUBER = enum.auto()

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


def _extract(arr: np.ndarray, timesteps: jnp.ndarray, broadcast_shape) -> jnp.ndarray:
    """Index a schedule array at per-batch timesteps and broadcast over the rest."""
    res = jnp.asarray(arr, dtype=jnp.float32)[timesteps]
    return res.reshape(res.shape[0], *([1] * (len(broadcast_shape) - 1)))


def _huber(x, y, delta: float = 1.0):
    """Smooth L1 (Huber) elementwise loss (reference :1019-1033)."""
    diff = jnp.abs(x - y)
    return jnp.where(diff < delta, 0.5 * diff**2, delta * (diff - 0.5 * delta))


class GaussianDiffusion:
    """The diffusion process utilities; stateless apart from precomputed schedules."""

    def __init__(
        self,
        *,
        betas: np.ndarray,
        model_mean_type: ModelMeanType,
        model_var_type: ModelVarType,
        loss_type: LossType,
        rescale_timesteps: bool = False,
    ):
        self.model_mean_type = model_mean_type
        self.model_var_type = model_var_type
        self.loss_type = loss_type
        self.rescale_timesteps = rescale_timesteps

        betas = np.array(betas, dtype=np.float64)
        assert betas.ndim == 1 and (0 < betas).all() and (betas <= 1).all()
        self.betas = betas
        self.num_timesteps = betas.shape[0]

        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas, axis=0)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.alphas_cumprod_next = np.append(self.alphas_cumprod[1:], 0.0)

        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)
        self.log_one_minus_alphas_cumprod = np.log(1.0 - self.alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod - 1)

        # posterior q(x_{t-1} | x_t, x_0)
        self.posterior_variance = (
            betas * (1.0 - self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        self.posterior_log_variance_clipped = np.log(
            np.append(self.posterior_variance[1], self.posterior_variance[1:])
        )
        self.posterior_mean_coef1 = (
            betas * np.sqrt(self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        self.posterior_mean_coef2 = (
            (1.0 - self.alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - self.alphas_cumprod)
        )

    # ------------------------------------------------------------- forward process

    def q_mean_variance(self, x_start, t):
        mean = _extract(self.sqrt_alphas_cumprod, t, x_start.shape) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, x_start.shape)
        log_variance = _extract(self.log_one_minus_alphas_cumprod, t, x_start.shape)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Diffuse x_0 to x_t (reference :199-218)."""
        return (
            _extract(self.sqrt_alphas_cumprod, t, x_start.shape) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.shape) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        posterior_mean = (
            _extract(self.posterior_mean_coef1, t, x_t.shape) * x_start
            + _extract(self.posterior_mean_coef2, t, x_t.shape) * x_t
        )
        posterior_variance = _extract(self.posterior_variance, t, x_t.shape)
        posterior_log_variance = _extract(
            self.posterior_log_variance_clipped, t, x_t.shape
        )
        return posterior_mean, posterior_variance, posterior_log_variance

    # ------------------------------------------------------------- reverse process

    def _scale_timesteps(self, t):
        if self.rescale_timesteps:
            return t.astype(jnp.float32) * (1000.0 / self.num_timesteps)
        return t

    def _predict_xstart_from_eps(self, x_t, t, eps):
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape) * eps
        )

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        return (
            _extract(1.0 / self.posterior_mean_coef1, t, x_t.shape) * xprev
            - _extract(
                self.posterior_mean_coef2 / self.posterior_mean_coef1, t, x_t.shape
            )
            * x_t
        )

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t - pred_xstart
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape)

    def p_mean_variance(
        self, model_fn, x, t, clip_denoised: bool = True, denoised_fn=None
    ):
        """Predict p(x_{t-1} | x_t): mean, variance, log-variance, pred x_0
        (reference :243-400, incl. the learned-variance channel split)."""
        model_output = model_fn(x, self._scale_timesteps(t))

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(self.posterior_log_variance_clipped, t, x.shape)
                max_log = _extract(np.log(self.betas), t, x.shape)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        elif self.model_var_type == ModelVarType.FIXED_LARGE:
            model_variance = _extract(
                np.append(self.posterior_variance[1], self.betas[1:]), t, x.shape
            )
            model_log_variance = _extract(
                np.log(np.append(self.posterior_variance[1], self.betas[1:])),
                t,
                x.shape,
            )
        else:  # FIXED_SMALL
            model_variance = _extract(self.posterior_variance, t, x.shape)
            model_log_variance = _extract(
                self.posterior_log_variance_clipped, t, x.shape
            )

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            return x0

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output)
            )
            model_mean = model_output
        elif self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        else:  # EPSILON
            pred_xstart = process_xstart(
                self._predict_xstart_from_eps(x, t, model_output)
            )
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # --------------------------------------------------------- classifier guidance

    def condition_mean(self, cond_fn, p_mean_var, x, t):
        """Shift the reverse mean by variance * grad(log p(y | x)) (reference :402-419)."""
        gradient = cond_fn(x, self._scale_timesteps(t))
        return p_mean_var["mean"] + p_mean_var["variance"] * gradient

    def condition_score(self, cond_fn, p_mean_var, x, t):
        """Condition the epsilon prediction with the classifier score (reference :421-439)."""
        alpha_bar = _extract(self.alphas_cumprod, t, x.shape)
        eps = self._predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, self._scale_timesteps(t))
        out = dict(p_mean_var)
        out["pred_xstart"] = self._predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(out["pred_xstart"], x, t)
        return out

    # ------------------------------------------------------------------- sampling

    def p_sample(
        self, model_fn, x, t, key, clip_denoised=True, denoised_fn=None, cond_fn=None
    ):
        """One ancestral sampling step (reference :441-486)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        if cond_fn is not None:
            out["mean"] = self.condition_mean(cond_fn, out, x, t)
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero_mask = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = out["mean"] + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
        return sample, out["pred_xstart"]

    def _timestep_sequence(self, max_iter: Optional[int]) -> np.ndarray:
        """Descending timesteps, optionally subsampled to ``max_iter`` steps
        (reference :574-587)."""
        if max_iter is not None and max_iter < self.num_timesteps:
            indices = np.linspace(
                0, self.num_timesteps - 1, max_iter, dtype=np.int64
            )
        else:
            indices = np.arange(self.num_timesteps)
        return indices[::-1].copy()

    def p_sample_loop(
        self,
        model_fn,
        shape,
        key,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        max_iter: Optional[int] = None,
    ):
        """Full reverse process as one compiled lax.scan (reference :488-608)."""
        key, init_key = jax.random.split(key)
        img = noise if noise is not None else jax.random.normal(init_key, shape)
        timesteps = jnp.asarray(self._timestep_sequence(max_iter))
        step_keys = jax.random.split(key, timesteps.shape[0])

        def step(img, inputs):
            t_scalar, step_key = inputs
            t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
            sample, _ = self.p_sample(
                model_fn, img, t, step_key, clip_denoised, denoised_fn, cond_fn
            )
            return sample, None

        img, _ = jax.lax.scan(step, img, (timesteps, step_keys))
        return img

    def ddim_sample(
        self,
        model_fn,
        x,
        t,
        key,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        eta: float = 0.0,
    ):
        """One DDIM step (reference :610-672)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _extract(self.alphas_cumprod, t, x.shape)
        alpha_bar_prev = _extract(self.alphas_cumprod_prev, t, x.shape)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(key, x.shape, x.dtype)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero_mask = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = mean_pred + nonzero_mask * sigma * noise
        return sample, out["pred_xstart"]

    def ddim_reverse_sample(
        self, model_fn, x, t, clip_denoised=True, denoised_fn=None, eta: float = 0.0
    ):
        """Deterministic encoding step x_t -> x_{t+1} (reference :674-711)."""
        assert eta == 0.0, "reverse ODE only available for deterministic path"
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        eps = (
            _extract(self.sqrt_recip_alphas_cumprod, t, x.shape) * x
            - out["pred_xstart"]
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, x.shape)
        alpha_bar_next = _extract(self.alphas_cumprod_next, t, x.shape)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1 - alpha_bar_next) * eps
        )
        return mean_pred, out["pred_xstart"]

    def ddim_sample_loop(
        self,
        model_fn,
        shape,
        key,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        cond_fn=None,
        eta: float = 0.0,
        max_iter: Optional[int] = None,
    ):
        """Full DDIM sampling as one lax.scan (reference :713-780)."""
        key, init_key = jax.random.split(key)
        img = noise if noise is not None else jax.random.normal(init_key, shape)
        timesteps = jnp.asarray(self._timestep_sequence(max_iter))
        step_keys = jax.random.split(key, timesteps.shape[0])

        def step(img, inputs):
            t_scalar, step_key = inputs
            t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
            sample, _ = self.ddim_sample(
                model_fn, img, t, step_key, clip_denoised, denoised_fn, cond_fn, eta
            )
            return sample, None

        img, _ = jax.lax.scan(step, img, (timesteps, step_keys))
        return img

    # --------------------------------------------------------------------- losses

    def _vb_terms_bpd(self, model_fn, x_start, x_t, t, clip_denoised=True):
        """Variational bound term at one timestep, in bits-per-dim (reference :782-815)."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where((t == 0), decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(self, model_fn, x_start, t, key, noise=None):
        """Per-batch-element training losses (reference :817-943)."""
        if noise is None:
            noise = jax.random.normal(key, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)

        terms = {}
        if self.loss_type in (LossType.KL, LossType.RESCALED_KL):
            terms["loss"] = self._vb_terms_bpd(model_fn, x_start, x_t, t)["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
        else:  # MSE / RESCALED_MSE / HUBER
            model_output = model_fn(x_t, self._scale_timesteps(t))

            if self.model_var_type in (
                ModelVarType.LEARNED,
                ModelVarType.LEARNED_RANGE,
            ):
                model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
                # learned-variance VLB term with a frozen mean (stop-gradient)
                frozen_out = jnp.concatenate(
                    [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
                )
                terms["vb"] = self._vb_terms_bpd(
                    lambda *_: frozen_out, x_start, x_t, t
                )["output"]
                if self.loss_type == LossType.RESCALED_MSE:
                    terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

            target = {
                ModelMeanType.PREVIOUS_X: self.q_posterior_mean_variance(
                    x_start, x_t, t
                )[0],
                ModelMeanType.START_X: x_start,
                ModelMeanType.EPSILON: noise,
            }[self.model_mean_type]

            if self.loss_type == LossType.HUBER:
                terms["mse"] = mean_flat(_huber(target, model_output))
            else:
                terms["mse"] = mean_flat((target - model_output) ** 2)
            terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        return terms

    def _prior_bpd(self, x_start):
        """KL(q(x_T | x_0) || N(0, I)) in bits-per-dim."""
        t = jnp.full((x_start.shape[0],), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior) / np.log(2.0)

    def calc_bpd_loop(self, model_fn, x_start, key, clip_denoised=True):
        """Total bits-per-dim over all timesteps via lax.scan (reference :945-1001)."""
        batch = x_start.shape[0]
        timesteps = jnp.arange(self.num_timesteps)[::-1]
        keys = jax.random.split(key, self.num_timesteps)

        def step(carry, inputs):
            t_scalar, step_key = inputs
            t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
            noise = jax.random.normal(step_key, x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = self._vb_terms_bpd(model_fn, x_start, x_t, t, clip_denoised)
            eps = self._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
            return carry, (out["output"], mse, mean_flat((eps - noise) ** 2))

        _, (vb, xstart_mse, mse) = jax.lax.scan(step, None, (timesteps, keys))
        total_bpd = vb.sum(axis=0) + self._prior_bpd(x_start)
        return {
            "total_bpd": total_bpd,
            "prior_bpd": self._prior_bpd(x_start),
            "vb": vb.T,
            "xstart_mse": xstart_mse.T,
            "mse": mse.T,
        }
