"""Pure-numpy D'Agostino-Pearson normality test (reference P6).

The reference QC filter (src/scip/masking/filters/normaltest.py:5-10)
calls ``scipy.stats.normaltest(x.ravel()).pvalue < 0.05`` — "True if
pixels are NOT normally distributed". scipy is absent in this
container, so the omnibus K^2 test is re-derived here from the
published formulas:

- skew z-score: D'Agostino (1970), Biometrika 57, 679-681.
- kurtosis z-score: Anscombe & Glynn (1983), Biometrika 70, 227-234.
- omnibus K^2 = z_s^2 + z_k^2 ~ chi^2(df=2): D'Agostino & Pearson
  (1973).  For df=2 the chi-square survival function is exactly
  ``exp(-K^2 / 2)``, so no incomplete-gamma machinery is needed.

Agreement with scipy is pinned in tests/test_masking.py against the
values published in scipy's own docstrings (a fixed "value table"
computed by scipy, not by this module).
"""

from __future__ import annotations

import numpy as np


def skewtest_z(x: np.ndarray) -> float:
    """D'Agostino skewness z-score (scipy.stats.skewtest statistic)."""
    x = np.asarray(x, dtype=np.float64).ravel()
    n = x.size
    if n < 8:
        raise ValueError(f"skewtest requires n >= 8, got {n}")
    m = x.mean()
    d = x - m
    m2 = np.mean(d * d)
    m3 = np.mean(d * d * d)
    g1 = 0.0 if m2 == 0 else m3 / m2**1.5
    y = g1 * np.sqrt(((n + 1.0) * (n + 3.0)) / (6.0 * (n - 2.0)))
    beta2 = (
        3.0
        * (n * n + 27.0 * n - 70.0)
        * (n + 1.0)
        * (n + 3.0)
        / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
    )
    w2 = -1.0 + np.sqrt(2.0 * (beta2 - 1.0))
    delta = 1.0 / np.sqrt(0.5 * np.log(w2))
    alpha = np.sqrt(2.0 / (w2 - 1.0))
    y = 1.0 if y == 0 else y
    return float(delta * np.log(y / alpha + np.sqrt((y / alpha) ** 2 + 1.0)))


def kurtosistest_z(x: np.ndarray) -> float:
    """Anscombe-Glynn kurtosis z-score (scipy.stats.kurtosistest
    statistic)."""
    x = np.asarray(x, dtype=np.float64).ravel()
    n = x.size
    if n < 5:
        raise ValueError(f"kurtosistest requires n >= 5, got {n}")
    m = x.mean()
    d = x - m
    m2 = np.mean(d * d)
    m4 = np.mean(d * d * d * d)
    b2 = 0.0 if m2 == 0 else m4 / (m2 * m2)  # Pearson kurtosis (not excess)
    e = 3.0 * (n - 1.0) / (n + 1.0)
    var_b2 = (
        24.0 * n * (n - 2.0) * (n - 3.0) / ((n + 1.0) ** 2 * (n + 3.0) * (n + 5.0))
    )
    z = (b2 - e) / np.sqrt(var_b2)
    sqrt_beta1 = (
        6.0
        * (n * n - 5.0 * n + 2.0)
        / ((n + 7.0) * (n + 9.0))
        * np.sqrt(6.0 * (n + 3.0) * (n + 5.0) / (n * (n - 2.0) * (n - 3.0)))
    )
    a = 6.0 + 8.0 / sqrt_beta1 * (
        2.0 / sqrt_beta1 + np.sqrt(1.0 + 4.0 / sqrt_beta1**2)
    )
    term1 = 1.0 - 2.0 / (9.0 * a)
    denom = 1.0 + z * np.sqrt(2.0 / (a - 4.0))
    if denom == 0:
        return float("nan")
    term2 = np.sign(denom) * ((1.0 - 2.0 / a) / abs(denom)) ** (1.0 / 3.0)
    return float((term1 - term2) / np.sqrt(2.0 / (9.0 * a)))


def normaltest_pvalue(x: np.ndarray) -> float:
    """p-value of the D'Agostino-Pearson omnibus K^2 test.

    K^2 = z_skew^2 + z_kurt^2 is chi^2(2) under normality; the df=2
    survival function is exp(-K^2/2) exactly.
    """
    zs = skewtest_z(x)
    zk = kurtosistest_z(x)
    k2 = zs * zs + zk * zk
    return float(np.exp(-0.5 * k2))


def normaltest_filter(x: np.ndarray, threshold: float = 0.05) -> bool:
    """Reference filters/normaltest.py:5-10 semantics: True when the
    pixels are NOT normally distributed at the given level."""
    return bool(normaltest_pvalue(x) < threshold)
