"""Plane-march kernel (analytic trapezoid cells): forward + VJP vs a jnp oracle.

The oracle re-implements the kernel's exact math (bf16 tents/patches, f32
accumulation, overlapping plane groups, per-cell relu-trapezoid transmittance with
a stop-gradient density centroid for the emission lerp) in differentiable jnp code;
jax.grad through it is the oracle for the replay-based backward kernel.  Runs in
interpreter mode on the CPU backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thr3ed_atom_tpu.ops.pallas.plane_march import (
    GS,
    PU,
    PV,
    ROWS,
    _relu_trap,
    plane_march,
    ray_lanes_for,
)

T_TILES, ENTRIES, R = 2, 3, 64
XG, U, V = 3, 32, 32
NCOEFF = 9
NF = 3 * NCOEFF
PL = 32  # lanes per plane for NCOEFF <= 9
LAN = GS * PL
RAY_LANES = ray_lanes_for(PL)


def _setup(key):
    rng = np.random.default_rng(11)
    tables = np.zeros((T_TILES, ENTRIES, 4), np.int32)
    tables[..., 0] = np.sort(rng.integers(0, XG, (T_TILES, ENTRIES)), axis=1)
    tables[..., 1] = rng.integers(0, U - PU + 1, (T_TILES, ENTRIES))
    tables[..., 2] = rng.integers(0, (V - PV) // 8 + 1, (T_TILES, ENTRIES)) * 8
    # mix of full-range, half, and quarter sub-range entries
    h = GS // 2
    packs = [
        0 * 256 + (GS - 1),
        0 * 256 + h,
        h * 256 + (GS - 1),
        0 * 256 + 2,
        (GS - 2) * 256 + (GS - 1),
    ]
    tables[..., 3] = rng.choice(packs, (T_TILES, ENTRIES))
    counts = np.array([[3], [2]], np.int32)

    rays = np.zeros((T_TILES, R, RAY_LANES), np.float32)
    rays[..., 0] = rng.uniform(4, 20, (T_TILES, R))
    rays[..., 1] = rng.uniform(-0.5, 0.5, (T_TILES, R))
    rays[..., 2] = rng.uniform(4, 20, (T_TILES, R))
    rays[..., 3] = rng.uniform(-0.5, 0.5, (T_TILES, R))
    rays[..., 4] = 2.0
    rays[..., 5] = 0.02
    rays[..., 6] = 0.0
    rays[..., 7] = rng.uniform(5, 2 * GS + 3, (T_TILES, R))  # jmax varies per ray
    rays[..., 8] = rng.uniform(0.05, 0.3, (T_TILES, R))
    ybasis = rng.standard_normal((T_TILES, R, NCOEFF)).astype(np.float32) * 0.4
    rays[..., 16:16 + NF] = np.tile(ybasis, (1, 1, 3))

    grid = (rng.standard_normal((XG, U, V, LAN)) * 0.4).astype(np.float32)
    return (
        jnp.asarray(tables),
        jnp.asarray(counts),
        jnp.asarray(rays),
        jnp.asarray(grid).astype(jnp.bfloat16),
    )


def _reference(tables, counts, rays, grid, relu_sigma=False, with_diffuse=False):
    """Differentiable jnp replica of the kernel math (per tile, per entry)."""
    grid_f = grid.astype(jnp.float32)
    outs = []
    for t in range(T_TILES):
        au, bu = rays[t, :, 0], rays[t, :, 1]
        av, bv = rays[t, :, 2], rays[t, :, 3]
        at, bt = rays[t, :, 4], rays[t, :, 5]
        jmin, jmax = rays[t, :, 6], rays[t, :, 7]
        delta = rays[t, :, 8]
        ytile = rays[t, :, 16:16 + PL]

        trans = jnp.ones((R,))
        acc = jnp.zeros((R, 8))
        for i in range(int(counts[t, 0])):
            xg, u0, v0, jpack = (int(v) for v in tables[t, i])
            jlo_e, jhi_e = jpack // 256, jpack % 256
            patch = grid_f[xg, u0:u0 + PU, v0:v0 + PV, :].reshape(ROWS, LAN)

            planes = []
            lives = []
            for b in range(GS):
                jg = xg * (GS - 1) + b
                u = au + bu * jg - u0
                v = av + bv * jg - v0
                live = (jg >= jmin) & (jg <= jmax) & (jlo_e <= b) & (b <= jhi_e)
                uq = jnp.arange(ROWS) // PV
                vq = jnp.arange(ROWS) % PV
                wu = jnp.maximum(
                    0.0, 1.0 - jnp.abs(u[:, None] - uq[None, :])
                ).astype(jnp.bfloat16)
                wv = jnp.maximum(
                    0.0, 1.0 - jnp.abs(v[:, None] - vq[None, :])
                ).astype(jnp.bfloat16)
                w_mat = jnp.where(live[:, None], (wu * wv).astype(jnp.float32), 0.0)
                ch = (w_mat @ patch)[:, b * PL:(b + 1) * PL]
                chy = ch * ytile
                sh = chy[:, :NF].reshape(R, 3, NCOEFF).sum(-1)
                dif = chy[:, 0:NF:NCOEFF]  # degree-0 lane of each colour
                planes.append((ch[:, NF], sh, dif))
                lives.append(live)

            for c in range(GS - 1):
                a_s, a_rgb, a_dif = planes[c]
                b_s, b_rgb, b_dif = planes[c + 1]
                integ, tbar, _da, _db = _relu_trap(a_s, b_s, relu_sigma)
                cell_live = lives[c] & lives[c + 1]
                integ = jnp.where(cell_live, integ, 0.0)
                tbar = jax.lax.stop_gradient(tbar)
                alpha = jnp.clip(1.0 - jnp.exp(-integ * delta), 0.0, 1.0)
                w = alpha * trans
                tb = tbar[:, None]
                mid = jax.nn.sigmoid((1.0 - tb) * a_rgb + tb * b_rgb)
                s_dep = at + bt * (xg * (GS - 1) + c) + bt * tbar
                if with_diffuse:
                    dmid = jax.nn.sigmoid((1.0 - tb) * a_dif + tb * b_dif)
                    dif_c = dmid * w[:, None]
                else:
                    dif_c = jnp.zeros((R, 3))
                acc = acc + jnp.concatenate(
                    [mid * w[:, None], w[:, None], (w * s_dep)[:, None], dif_c], 1
                )
                trans = trans * (1.0 - alpha)
        outs.append(acc)
    return jnp.stack(outs)


def test_relu_trap_derivatives_are_exact():
    """The closed-form (dIda, dIdb) must equal autodiff of the integral formula
    in every sign regime (both+, both-, a>0>b, a<0<b, near-equal)."""
    # avoid measure-zero subgradient ties (a + b == 0, or a == b == 0): the
    # closed form and autodiff may legitimately pick different conventions there
    a = jnp.asarray([1.0, -1.0, 2.0, -2.0, 0.5, 0.3, -0.4])
    b = jnp.asarray([2.0, -0.5, -1.0, 3.0, 0.8, -0.5, -0.1])
    for relu_sigma in (True, False):
        integ_fn = lambda aa, bb: _relu_trap(aa, bb, relu_sigma)[0].sum()
        ga = jax.grad(integ_fn, argnums=0)(a, b)
        gb = jax.grad(integ_fn, argnums=1)(a, b)
        _, _, da, db = _relu_trap(a, b, relu_sigma)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(da), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(db), atol=1e-5)


def test_relu_trap_matches_dense_quadrature():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(64) * 2)
    b = jnp.asarray(rng.standard_normal(64) * 2)
    ts = (np.arange(4096) + 0.5) / 4096
    lin = a[:, None] + (b - a)[:, None] * ts[None, :]
    integ, tbar, _, _ = _relu_trap(a, b, True)
    ref = jnp.maximum(lin, 0.0).mean(1)
    np.testing.assert_allclose(np.asarray(integ), np.asarray(ref), atol=1e-3)
    num = (jnp.maximum(lin, 0.0) * ts[None, :]).mean(1)
    mask = np.asarray(ref) > 1e-3
    np.testing.assert_allclose(
        np.asarray(tbar)[mask], (np.asarray(num / jnp.maximum(ref, 1e-9)))[mask],
        atol=1e-3,
    )


@pytest.mark.parametrize("with_diffuse", [False, True])
def test_forward_matches_reference(key, with_diffuse):
    tables, counts, rays, grid = _setup(key)
    out_k = plane_march(
        tables, counts, rays, grid, ncoeff=NCOEFF, exit_eps=0.0,
        with_diffuse=with_diffuse, interpret=True,
    )
    out_r = _reference(tables, counts, rays, grid, with_diffuse=with_diffuse)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), atol=5e-3, rtol=1e-2
    )


@pytest.mark.parametrize("relu_sigma,with_diffuse", [(False, False), (True, True)])
def test_grid_gradient_matches_reference(key, relu_sigma, with_diffuse):
    tables, counts, rays, grid = _setup(key)
    gw = jax.random.normal(key, (T_TILES, R, 8))

    def loss_k(g):
        out = plane_march(
            tables, counts, rays, g, ncoeff=NCOEFF, relu_sigma=relu_sigma,
            exit_eps=0.0, with_diffuse=with_diffuse, interpret=True,
        )
        return jnp.sum(out * gw)

    def loss_r(g):
        out = _reference(
            tables, counts, rays, g, relu_sigma=relu_sigma,
            with_diffuse=with_diffuse,
        )
        return jnp.sum(out * gw)

    gk = np.asarray(jax.grad(loss_k)(grid), dtype=np.float32)
    gr = np.asarray(jax.grad(loss_r)(grid), dtype=np.float32)
    # the backward kernel casts d_interp to bf16 for the MXU scatter matmul
    scale = np.abs(gr).max()
    assert scale > 1e-3, "degenerate test: gradient is ~zero"
    np.testing.assert_allclose(gk, gr, atol=2e-2 * scale, rtol=5e-2)


def test_gradient_with_early_exit_consistent(key):
    """With early exit enabled, forward and backward traverse the same prefix, so
    the gradient must equal the no-exit gradient whenever transmittance never
    reaches the threshold (low-density scene)."""
    tables, counts, rays, grid = _setup(key)
    rays = rays.at[..., 8].set(0.01)  # low alpha: no tile saturates

    def loss(g, eps):
        out = plane_march(
            tables, counts, rays, g, ncoeff=NCOEFF, exit_eps=eps, interpret=True
        )
        return jnp.sum(out[..., :4] ** 2)

    g0 = jax.grad(lambda g: loss(g, 0.0))(grid)
    g1 = jax.grad(lambda g: loss(g, 1e-4))(grid)
    np.testing.assert_allclose(
        np.asarray(g0, dtype=np.float32), np.asarray(g1, dtype=np.float32),
        atol=1e-6,
    )
