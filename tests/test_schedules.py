import numpy as np

from pharmaforge_tpu.models.schedules import (
    clip_noise_schedule,
    cosine_beta_schedule,
    make_gamma_table,
    polynomial_schedule,
)


def test_polynomial_schedule_closed_form():
    """polynomial_2 before clipping/precision follows (1-(t/T')^2)^2."""
    T = 50
    s = 1e-4
    alphas2 = polynomial_schedule(T, s=s, power=2.0)
    steps = T + 1
    x = np.linspace(0, steps, steps)
    raw = (1 - (x / steps) ** 2) ** 2
    raw = clip_noise_schedule(raw, 0.001)
    expected = (1 - 2 * s) * raw + s
    np.testing.assert_allclose(alphas2, expected, rtol=1e-12)


def test_gamma_table_properties():
    for name in ["polynomial_2", "polynomial_3", "cosine"]:
        gamma = make_gamma_table(name, 100, 1e-5)
        assert gamma.shape == (101,)
        assert np.all(np.isfinite(gamma))
        # gamma increases with t (noise grows)
        assert np.all(np.diff(gamma) > 0)


def test_alpha_sigma_identity():
    """alpha^2 + sigma^2 = 1 by construction of gamma."""
    gamma = make_gamma_table("polynomial_2", 100, 1e-5).astype(np.float64)
    alpha2 = 1.0 / (1.0 + np.exp(gamma))   # sigmoid(-gamma)
    sigma2 = 1.0 / (1.0 + np.exp(-gamma))  # sigmoid(gamma)
    np.testing.assert_allclose(alpha2 + sigma2, 1.0, atol=1e-12)


def test_gamma_endpoints_match_precision():
    """At t=0 alpha^2 = 1 - 2s + s (nearly 1); at t=T alpha^2 ~= s."""
    s = 1e-5
    T = 100
    gamma = make_gamma_table("polynomial_2", T, s).astype(np.float64)
    alpha2 = 1.0 / (1.0 + np.exp(gamma))
    assert abs(alpha2[0] - (1 - s)) < 1e-6
    assert alpha2[-1] < 0.05


def test_cosine_beta_schedule_shape():
    a = cosine_beta_schedule(100)
    assert a.shape == (101,)
    assert np.all(a > 0) and np.all(a <= 1)
