"""Driver-side distribution fits — pure numpy (no scipy/sklearn in this
container).

Web-text analogs of the reference's model-fit operators (SURVEY.md §2.7):

* ``gamma_mle`` — MF1: gamma fit of the length distribution. Uses Minka's
  fixed-point iteration (T. Minka, "Estimating a Gamma distribution", 2002 —
  public note), which needs only the sufficient statistics ``mean(x)`` and
  ``mean(log x)`` — both computable as Spark aggregates, so the fit never
  collects raw data.
* ``gmm_1d`` — MF2: 2-component 1-D Gaussian mixture EM (sklearn stand-in).
* ``norm_lognorm_em`` — MF3: Normal + LogNormal mixture EM, written from the
  standard EM equations (M-step for lognormal fits a normal to log x).

digamma/trigamma use the standard recurrence + asymptotic series
(Abramowitz & Stegun 6.3.18 / 6.4.12), accurate to ~1e-12 (recurrence lifts x above 12 first).
"""

from __future__ import annotations

import math

import numpy as np


def digamma(x: float) -> float:
    r = 0.0
    while x < 12.0:
        r -= 1.0 / x
        x += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    return r + math.log(x) - 0.5 * inv - inv2 * (
        1.0 / 12 - inv2 * (1.0 / 120 - inv2 * (1.0 / 252 - inv2 / 240))
    )


def trigamma(x: float) -> float:
    r = 0.0
    while x < 12.0:
        r += 1.0 / (x * x)
        x += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    return r + inv * (1.0 + inv * (0.5 + inv * (1.0 / 6 - inv2 * (1.0 / 30 - inv2 / 42))))


def gamma_mle(mean: float, meanlog: float, iters: int = 100) -> tuple[float, float]:
    """Gamma(shape k, scale θ) MLE from sufficient stats via Minka's
    fixed-point: 1/k_new = 1/k + (meanlog − log mean + log k − ψ(k)) /
    (k² (1/k − ψ′(k))). Returns (shape, scale)."""
    s = math.log(mean) - meanlog
    if s <= 0:  # degenerate (zero-variance) input
        return float("inf"), 0.0
    k = (3 - s + math.sqrt((s - 3) ** 2 + 24 * s)) / (12 * s)  # Minka's init
    for _ in range(iters):
        denom = k * k * (1.0 / k - trigamma(k))
        k_new = 1.0 / (1.0 / k + (meanlog - math.log(mean) + math.log(k) - digamma(k)) / denom)
        if not math.isfinite(k_new) or k_new <= 0:
            break
        if abs(k_new - k) < 1e-12:
            k = k_new
            break
        k = k_new
    return k, mean / k


def _norm_pdf(x: np.ndarray, mu: float, sigma: float) -> np.ndarray:
    sigma = max(sigma, 1e-12)
    return np.exp(-0.5 * ((x - mu) / sigma) ** 2) / (sigma * math.sqrt(2 * math.pi))


def gmm_1d(
    x: np.ndarray, k: int = 2, iters: int = 200, seed: int = 7
) -> list[dict]:
    """1-D k-component Gaussian mixture EM. Deterministic quantile init.
    Returns per-component dicts (weight, mu, sigma), sorted by mu."""
    x = np.asarray(x, dtype=np.float64)
    qs = np.quantile(x, np.linspace(0.2, 0.8, k))
    mus = qs.copy()
    sigmas = np.full(k, max(x.std(), 1e-6))
    weights = np.full(k, 1.0 / k)
    for _ in range(iters):
        resp = np.stack([w * _norm_pdf(x, m, s) for w, m, s in zip(weights, mus, sigmas)])
        resp_sum = resp.sum(axis=0)
        resp_sum[resp_sum == 0] = 1e-300
        resp /= resp_sum
        nk = resp.sum(axis=1)
        new_w = nk / len(x)
        new_mu = (resp @ x) / np.maximum(nk, 1e-300)
        new_sig = np.sqrt(
            np.maximum((resp @ (x * x)) / np.maximum(nk, 1e-300) - new_mu**2, 1e-12)
        )
        if np.allclose(new_mu, mus, atol=1e-10) and np.allclose(new_sig, sigmas, atol=1e-10):
            weights, mus, sigmas = new_w, new_mu, new_sig
            break
        weights, mus, sigmas = new_w, new_mu, new_sig
    order = np.argsort(mus)
    return [
        {"weight": float(weights[i]), "mu": float(mus[i]), "sigma": float(sigmas[i])}
        for i in order
    ]


def norm_lognorm_em(x: np.ndarray, iters: int = 200) -> dict:
    """Normal + LogNormal 2-component mixture EM (MF3 analog; reference
    ``lq_coverage.py:552-566``). Requires x > 0. Returns both components and
    the lognormal mode exp(μ − σ²)."""
    x = np.asarray(x, dtype=np.float64)
    x = x[x > 0]
    lx = np.log(x)
    # init from a 2-component GMM so the components start separated
    # (flat quantile init lets one component swallow both modes)
    g = gmm_1d(x, k=2)
    mu_n, sig_n = g[0]["mu"], max(g[0]["sigma"], 1e-6)
    mu_l = math.log(max(g[1]["mu"], 1e-12))
    sig_l = max(g[1]["sigma"] / max(g[1]["mu"], 1e-12), 1e-6)  # delta method
    w = g[0]["weight"]
    for _ in range(iters):
        p_n = w * _norm_pdf(x, mu_n, sig_n)
        p_l = (1 - w) * _norm_pdf(lx, mu_l, sig_l) / x  # lognormal density
        tot = p_n + p_l
        tot[tot == 0] = 1e-300
        r = p_n / tot
        nw = float(r.mean())
        mu_n = float((r * x).sum() / max(r.sum(), 1e-300))
        sig_n = max(math.sqrt(max((r * (x - mu_n) ** 2).sum() / max(r.sum(), 1e-300), 1e-12)), 1e-9)
        rl = 1 - r
        mu_l = float((rl * lx).sum() / max(rl.sum(), 1e-300))
        sig_l = max(math.sqrt(max((rl * (lx - mu_l) ** 2).sum() / max(rl.sum(), 1e-300), 1e-12)), 1e-9)
        w = nw
    return {
        "normal": {"weight": w, "mu": mu_n, "sigma": sig_n},
        "lognormal": {"weight": 1 - w, "mu": mu_l, "sigma": sig_l},
        "lognormal_mode": math.exp(mu_l - sig_l**2),
    }


def kde_gaussian(
    x: np.ndarray, grid: np.ndarray | None = None, n_grid: int = 128, bandwidth: float | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Gaussian KDE evaluated on a grid (MF7 analog; the reference overlays
    ``scipy.stats.gaussian_kde`` on every histogram plot, e.g.
    ``lq_nanopore.py`` plot paths). Pure numpy; Scott's rule bandwidth
    (the scipy default) unless given. Runs on a bounded driver-side sample —
    at corpus scale feed it the hash-priority sample, never raw data.

    Returns (grid, density); density integrates to ~1 over the grid span.
    """
    x = np.asarray(x, dtype=np.float64)
    x = x[np.isfinite(x)]
    if x.size == 0:
        raise ValueError("kde_gaussian: empty input")
    sd = float(x.std(ddof=1)) if x.size > 1 else 1.0
    if bandwidth is None:
        bandwidth = max(sd * x.size ** (-1.0 / 5.0), 1e-12)  # Scott's rule
    if grid is None:
        lo, hi = x.min() - 3 * bandwidth, x.max() + 3 * bandwidth
        grid = np.linspace(lo, hi, n_grid)
    z = (grid[:, None] - x[None, :]) / bandwidth
    dens = np.exp(-0.5 * z * z).sum(axis=1) / (x.size * bandwidth * math.sqrt(2 * math.pi))
    return grid, dens
