"""Quadrature quality: K-point cell sampling vs analytic endpoint trapezoid.

The slab march integrates transmittance over ray cells of a trilinear field.
Along a ray the field is cubic in t within a cell; relu adds kinks. Candidates:
  K=1: one true-field sample at the cell center (round-2 speed mode)
  K=2: true-field samples at t=0.25/0.75 (round-2 quality default, 2x cost)
  TRAPEZOID: exact integral of relu(linear lerp of the two crossing values)
             (round-3 candidate: K=1 cost, no jitter needed)
Oracle: 64-point midpoint quadrature of the true field per cell.

Pure numpy, runs on CPU: python experiments/quality_analytic.py
"""
import numpy as np


def trilinear(grid, pts):
    """grid [W, D, H, C]; pts [N, 3] in continuous vertex coords."""
    dims = grid.shape[:3]
    p = np.clip(pts, 0.0, np.array(dims, np.float64) - 1.0 - 1e-9)
    i0 = np.floor(p).astype(int)
    f = p - i0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                out = out + w[:, None] * grid[
                    np.minimum(i0[:, 0] + dx, dims[0] - 1),
                    np.minimum(i0[:, 1] + dy, dims[1] - 1),
                    np.minimum(i0[:, 2] + dz, dims[2] - 1),
                ]
    return out


def composite(sig_samples, rgb_samples, dt):
    """sig [N, S], rgb [N, S, 3], dt scalar step -> colour [N, 3]."""
    alpha = 1.0 - np.exp(-np.maximum(sig_samples, 0.0) * dt)
    T = np.cumprod(1.0 - alpha + 1e-12, axis=1)
    T = np.concatenate([np.ones_like(T[:, :1]), T[:, :-1]], axis=1)
    w = alpha * T
    col = (w[..., None] * (1.0 / (1.0 + np.exp(-rgb_samples)))).sum(1)
    return col, w.sum(1)


def _relu_lin_integrals(a, b):
    """I = int_0^1 relu(a+(b-a)t) dt and centroid tbar = int t relu / I."""
    p = np.maximum(a, 0.0)
    q = np.maximum(b, 0.0)
    s = a - b
    safe = np.where(np.abs(s) > 1e-9, s, 1.0)
    integ = np.where(np.abs(s) > 1e-9, (p * p - q * q) / (2.0 * safe),
                     0.5 * (p + q))
    ts = np.clip(a / safe, 0.0, 1.0)  # zero crossing (clipped)

    def F(t):  # int_0^t sigma(t') t' dt'
        return a * t * t / 2.0 + (b - a) * t**3 / 3.0

    num = np.where(
        (a >= 0) & (b >= 0),
        F(1.0),
        np.where(a > b, F(ts), F(1.0) - F(ts)),  # a>0>b: head; a<0<b: tail
    )
    num = np.where((a <= 0) & (b <= 0), 0.0, num)
    tbar = np.clip(num / np.maximum(integ, 1e-9), 0.0, 1.0)
    return integ, tbar


def _fb_composite(alpha_cells, col_cells):
    T = np.cumprod(1.0 - alpha_cells + 1e-12, axis=1)
    T = np.concatenate([np.ones_like(T[:, :1]), T[:, :-1]], axis=1)
    w = alpha_cells * T
    col = (w[..., None] * col_cells).sum(1)
    return col, w.sum(1)


def composite_trapezoid(sig0, sig1, rgb0, rgb1, dt, weighted=False):
    """endpoint values per cell [N, S(+1) -> S cells]."""
    integ, tbar = _relu_lin_integrals(sig0, sig1)
    alpha = 1.0 - np.exp(-integ * dt)
    tm = tbar[..., None] if weighted else 0.5
    mid = (1.0 - tm) * rgb0 + tm * rgb1
    return _fb_composite(alpha, 1.0 / (1.0 + np.exp(-mid)))


def composite_split(sig0, sigc, sig1, rgb0, rgbc, rgb1, dt):
    """piecewise-linear through endpoints + true center; trapezoid+centroid per
    half, composited as 2S sub-cells."""
    N, S = sig0.shape
    i1, t1 = _relu_lin_integrals(sig0, sigc)
    i2, t2 = _relu_lin_integrals(sigc, sig1)
    a1 = 1.0 - np.exp(-i1 * dt * 0.5)
    a2 = 1.0 - np.exp(-i2 * dt * 0.5)
    c1 = (1.0 - t1)[..., None] * rgb0 + t1[..., None] * rgbc
    c2 = (1.0 - t2)[..., None] * rgbc + t2[..., None] * rgb1
    alpha = np.stack([a1, a2], axis=2).reshape(N, 2 * S)
    cols = 1.0 / (1.0 + np.exp(-np.stack([c1, c2], axis=2).reshape(N, 2 * S, 3)))
    return _fb_composite(alpha, cols)


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return -10.0 * np.log10(max(mse, 1e-20))


def main(scale_list=(0.3, 1.0, 3.0, 10.0)):
    rng = np.random.default_rng(0)
    G = 48
    # relu-field-like grid: raw density negative in empty space, positive blobs
    sigma = rng.normal(size=(G, G, G, 1)) * 0.5 - 1.0
    for _ in range(6):
        c = rng.uniform(8, G - 8, 3)
        r = rng.uniform(3, 9)
        idx = np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"), -1)
        d2 = ((idx - c) ** 2).sum(-1)
        sigma[..., 0] += 8.0 * np.exp(-d2 / (2 * r * r))
    feats = rng.normal(size=(G, G, G, 3)) * 1.5
    grid = np.concatenate([feats, sigma], axis=-1)

    N, S = 200, G - 1  # rays, cells
    # rays marching along axis 0 with mild in-plane drift
    u0 = rng.uniform(1, G - 2, (N, 2))
    du = rng.uniform(-0.35, 0.35, (N, 2))

    def pts_at(tq):
        """tq [N, M] axis positions -> [N, M, 3] points."""
        uv = u0[:, None, :] + du[:, None, :] * tq[..., None]
        return np.concatenate([tq[..., None], uv], axis=-1)

    for dens_scale in scale_list:
        def field(tq):
            vals = trilinear(grid, pts_at(tq).reshape(-1, 3)).reshape(
                tq.shape + (4,)
            )
            return vals[..., 3] * dens_scale, vals[..., 0:3]

        cells = np.arange(S, dtype=np.float64)
        # oracle: 64 midpoint samples per cell
        M = 64
        sub = (np.arange(M) + 0.5) / M
        tq_o = (cells[None, :, None] + sub[None, None, :]).reshape(1, S * M)
        tq_o = np.broadcast_to(tq_o, (N, S * M))
        so, fo = field(tq_o)
        col_o, acc_o = composite(so, fo, 1.0 / M)

        results = {}
        s1, f1 = field(np.broadcast_to(cells[None] + 0.5, (N, S)))
        results["K=1 center"] = composite(s1, f1, 1.0)

        tq2 = np.stack(
            [cells + 0.25, cells + 0.75], axis=-1
        ).reshape(1, S * 2)
        s2, f2 = field(np.broadcast_to(tq2, (N, S * 2)))
        results["K=2"] = composite(s2, f2, 0.5)

        tq4 = (cells[None, :, None] + (np.arange(4)[None, None] + 0.5) / 4).reshape(1, 4 * S)
        s4, f4 = field(np.broadcast_to(tq4, (N, S * 4)))
        results["K=4"] = composite(s4, f4, 0.25)

        tp = np.broadcast_to(cells[None], (N, S))
        sp0, fp0 = field(tp)
        sp1, fp1 = field(tp + 1.0)
        results["trapezoid"] = composite_trapezoid(sp0, sp1, fp0, fp1, 1.0)
        results["trap wcol"] = composite_trapezoid(
            sp0, sp1, fp0, fp1, 1.0, weighted=True
        )
        results["split p+c"] = composite_split(sp0, s1, sp1, fp0, f1, fp1, 1.0)

        def chain_trap(sig, rgb, step):
            """Samples along the ray (spacing `step` cells): piecewise-linear
            between consecutive samples (trapezoid + weighted colour), plus flat
            half-segments at both ends."""
            Ns, Ss = sig.shape
            a, b = sig[:, :-1], sig[:, 1:]
            i_m, t_m = _relu_lin_integrals(a, b)
            al_m = 1.0 - np.exp(-i_m * step)
            c_m = (1.0 - t_m[..., None]) * rgb[:, :-1] + t_m[..., None] * rgb[:, 1:]
            al_end0 = 1.0 - np.exp(-np.maximum(sig[:, :1], 0) * step * 0.5)
            al_end1 = 1.0 - np.exp(-np.maximum(sig[:, -1:], 0) * step * 0.5)
            alpha = np.concatenate([al_end0, al_m, al_end1], axis=1)
            cols = np.concatenate(
                [rgb[:, :1], c_m, rgb[:, -1:]], axis=1
            )
            return _fb_composite(alpha, 1.0 / (1.0 + np.exp(-cols)))

        results["K=1 chain-t"] = chain_trap(s1, f1, 1.0)
        results["K=2 chain-t"] = chain_trap(s2, f2, 0.5)

        # linear-model oracle: dense quadrature of the piecewise-linear
        # endpoint interpolant — the ceiling for any endpoint-only method
        Ml = 32
        subl = (np.arange(Ml) + 0.5) / Ml
        sl = (
            sp0[:, :, None] * (1 - subl[None, None]) + sp1[:, :, None] * subl[None, None]
        ).reshape(N, S * Ml)
        fl = (
            fp0[:, :, None, :] * (1 - subl[None, None, :, None])
            + fp1[:, :, None, :] * subl[None, None, :, None]
        ).reshape(N, S * Ml, 3)
        results["lin oracle"] = composite(sl, fl, 1.0 / Ml)

        print(f"density scale {dens_scale:5.1f}  (oracle mean acc "
              f"{acc_o.mean():.3f})")
        for k, (col, acc) in results.items():
            print(
                f"  {k:12s} colour PSNR {psnr(col, col_o):6.2f} dB   "
                f"acc err {np.abs(acc - acc_o).mean():.5f}"
            )


if __name__ == "__main__":
    main()
