"""Sampling + distribution kernels (``util/Sampling.scala:20-66``,
``util/BinomialDistribution.scala:19-44``) on counter-based RNG — every
sample is a pure function of (seed, position), so distributed samplers are
reproducible at any parallelism (the reference's seeded ``scala.util.Random``
is inherently sequential)."""

from __future__ import annotations

import numpy as np

from cassovary_ray.hashing import counter_rng_uniform


def random_subset(values: np.ndarray, k: int, seed: int = 1) -> np.ndarray:
    """k-subset without replacement — Fisher-Yates semantics
    (``Sampling.randomSubset``, ``Sampling.scala:20-35``) driven by counter
    RNG: a deterministic key per element, take the k smallest keys."""
    values = np.asarray(values)
    if k >= len(values):
        return values.copy()
    keys = counter_rng_uniform(seed, np.arange(len(values), dtype=np.int64), 0)
    return values[np.argsort(keys, kind="stable")[:k]]


def sample_dataset(ds, fraction: float, seed: int = 1, key_col: str | None = None):
    """Deterministic Bernoulli(fraction) row sample of a Dataset.

    Unlike ``ds.random_sample`` the decision is a pure function of the row's
    key (``key_col``, default: row position within batch + batch content
    hash is NOT stable — pass a key column for cross-run stability)."""
    import pyarrow as pa

    def kernel(batch: pa.Table) -> pa.Table:
        if key_col is not None:
            ent = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            ent = np.arange(len(batch), dtype=np.uint64)
        u = counter_rng_uniform(seed, ent, 0)
        return batch.filter(pa.array(u < fraction))

    return ds.map_batches(kernel, batch_format="pyarrow")


class BinomialDistribution:
    """Exact binomial pmf/cdf + inverse-cdf sampling
    (``BinomialDistribution.scala:19-44``)."""

    def __init__(self, n: int, p: float):
        self.n, self.p = n, p
        k = np.arange(n + 1)
        log_pmf = (
            _log_comb(n, k) + k * np.log(p if p > 0 else 1.0)
            + (n - k) * np.log1p(-p if p < 1 else 0.0)
        )
        if p == 0:
            pmf = np.zeros(n + 1)
            pmf[0] = 1.0
        elif p == 1:
            pmf = np.zeros(n + 1)
            pmf[n] = 1.0
        else:
            pmf = np.exp(log_pmf)
        self.pmf = pmf / pmf.sum()
        self.cdf = np.cumsum(self.pmf)

    def sample(self, size: int, seed: int = 1) -> np.ndarray:
        """Inverse-CDF (binary search) sampling on counter RNG — the
        reference's ``sampleWithSearch`` strategy."""
        u = counter_rng_uniform(seed, np.arange(size, dtype=np.int64), 0)
        return np.searchsorted(self.cdf, u, side="right").clip(0, self.n)


def _log_comb(n: int, k: np.ndarray) -> np.ndarray:
    from math import lgamma

    lg = np.vectorize(lgamma)
    return lg(n + 1) - lg(k + 1) - lg(n - k + 1)
