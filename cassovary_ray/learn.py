"""In-dataflow model training: distributed full-batch logistic regression
with integer-quantized gradient reductions.

The training-data-pipeline counterpart of a quality classifier (fastText /
logistic gates in CCNet-style curation): the model is TRAINED inside the
Ray Data pipeline — one streaming pass per GD step, per-batch partial
gradients, no driver-side feature materialization.

Reproducibility contract (the ANF/HLL stance, see ``engine.ANF_HLL_QUANT``):
each row's per-feature gradient contribution is floor-quantized to a fixed
``2^-quant_bits`` grid and the reduction is an exact int64 sum — weights are
therefore bit-identical at any parallelism and the whole 10-step training
loop unrolls into DuckDB SQL (``oracles-style`` mirror in
``queries.ORACLE_SQL['doc_quality_lr']``). The only cross-library float risk
is libm ``exp`` differing by ≤1 ulp before the floor — flip probability
~2^-32 per row-step, the same acceptance as the HyperBall ``ln`` branch.

Cassovary has no learning surface (graph library); this follows the standard
distributed full-batch GD recipe (partial gradient pre-combine — the
map-side combiner discipline of every wide step in this repo).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

FEATURES = ("bias", "tokens_kb", "alpha_frac", "chars_4k")


def _doc_features(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(X, y) for a documents batch — every feature an exact float64
    derivation of the integer quality kernels (power-of-two scalings are
    exact; the alpha fraction is one division per row, identical in SQL):

    - bias 1.0
    - n_tokens / 1024  (whitespace tokens, the ``token_counts`` kernel)
    - n_alpha / n_chars (0 when the text is empty)
    - n_chars / 4096
    Label: lang == 'en'.
    """
    from cassovary_ray.textops import _n_tokens_arrow

    import pyarrow.compute as pc

    text = batch["text"]
    n_tokens = _n_tokens_arrow(text).to_numpy(zero_copy_only=False)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(
        zero_copy_only=False)
    n_alpha = pc.cast(pc.utf8_length(
        pc.replace_substring_regex(text, "[^a-zA-Z]", "")),
        pa.int64()).to_numpy(zero_copy_only=False)
    x = np.empty((len(batch), 4), dtype=np.float64)
    x[:, 0] = 1.0
    x[:, 1] = n_tokens / 1024.0
    with np.errstate(invalid="ignore", divide="ignore"):
        x[:, 2] = np.where(n_chars > 0, n_alpha / n_chars, 0.0)
    x[:, 3] = n_chars / 4096.0
    y = (np.asarray(batch["lang"].to_pylist()) == "en").astype(np.float64)
    return x, y


def train_quality_lr(docs, iterations: int = 10, lr: float = 0.5,
                     quant_bits: int = 20):
    """Train a 4-feature logistic-regression language/quality gate by
    distributed full-batch gradient descent; returns
    ``pa.Table(feature, weight)``.

    Per step: z = ((w0·1 + w1·x1) + w2·x2) + w3·x3 (left-assoc fold,
    mirrored literally in SQL), p = 1/(1+exp(−z)), and the update is

        w_j ← w_j − lr · (Σ_i floor((p_i − y_i)·x_ij · 2^Q) / 2^Q) / N

    with the Σ an exact int64 reduction of per-row quantized contributions
    — batch/partition/order-independent by construction. One streaming
    pass over ``docs`` per iteration; each batch emits 4 int64 partials
    (the map-side combine), the driver folds blocks×4 ints and updates w.
    int64 bound: |Σ| < N · max|x| · 2^Q — overflows only past ~10^12 rows
    at these feature scales; shard the reduction before that."""
    from ray.data.aggregate import Sum

    Q = float(1 << quant_bits)
    n_docs = docs.count()
    w = np.zeros(4, dtype=np.float64)
    cols = [f"g{j}" for j in range(4)]
    feats = docs.select_columns(["text", "lang"])

    for _ in range(iterations):
        wref = ray.put(w.copy())

        def partial(batch: pa.Table) -> pa.Table:
            ww = ray.get(wref)
            x, y = _doc_features(batch)
            # left-assoc fold so SQL replays the identical doubles
            z = ww[0] * x[:, 0]
            for j in range(1, 4):
                z = z + ww[j] * x[:, j]
            p = 1.0 / (1.0 + np.exp(-z))
            g = np.floor((p - y)[:, None] * x * Q).astype(np.int64)
            s = g.sum(axis=0)
            return pa.table({c: pa.array([s[j]], pa.int64())
                             for j, c in enumerate(cols)})

        sums = (
            feats.map_batches(partial, batch_format="pyarrow")
            .aggregate(*[Sum(c, alias_name=c) for c in cols])
        )
        grad = np.array([sums[f"sum({c})"] if f"sum({c})" in sums else sums[c]
                         for c in cols], dtype=np.float64)
        w = w - lr * (grad / Q) / float(n_docs)

    return pa.table({"feature": pa.array(list(FEATURES), pa.string()),
                     "weight": pa.array(w, pa.float64())})


def quality_lr_sql(iterations: int = 10, lr: float = 0.5,
                   quant_bits: int = 20, table: str = "documents") -> str:
    """DuckDB mirror of :func:`train_quality_lr`: the identical features,
    fold order, quantized gradient sums, and update rule unrolled
    ``iterations`` times. Returns (feature, weight)."""
    Q = float(1 << quant_bits)
    parts = [
        "WITH f AS MATERIALIZED (SELECT"
        " 1.0 AS x0,"
        " length(regexp_split_to_array(trim(text), '\\s+')) / 1024.0 AS x1,"
        " CASE WHEN length(text) > 0 THEN"
        " length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))"
        " * 1.0 / length(text) ELSE 0.0 END AS x2,"
        " length(text) / 4096.0 AS x3,"
        " CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y"
        f" FROM {table})",
        "n AS (SELECT count(*) AS cnt FROM f)",
        "w0(w0, w1, w2, w3) AS (VALUES (0.0, 0.0, 0.0, 0.0))",
    ]
    for t in range(iterations):
        z = "(((w.w0 * f.x0 + w.w1 * f.x1) + w.w2 * f.x2) + w.w3 * f.x3)"
        p = f"(1.0 / (1.0 + exp(-{z})))"
        gsel = ", ".join(
            f"sum(CAST(floor(({p} - f.y) * f.x{j} * {Q!r}) AS BIGINT))"
            f" AS g{j}" for j in range(4))
        parts.append(
            f"g{t} AS (SELECT {gsel} FROM f CROSS JOIN w{t} w)")
        wsel = ", ".join(
            f"w.w{j} - {lr!r} * (g.g{j} / {Q!r}) / n.cnt AS w{j}"
            for j in range(4))
        parts.append(
            f"w{t + 1}(w0, w1, w2, w3) AS ("
            f"SELECT {wsel} FROM w{t} w CROSS JOIN g{t} g CROSS JOIN n)")
    rows = [
        f"SELECT '{name}' AS feature, w{j} AS weight FROM w{iterations}"
        for j, name in enumerate(FEATURES)]
    return ",\n".join(parts) + "\n" + " UNION ALL ".join(rows)
