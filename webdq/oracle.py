"""Driver-side pandas/numpy reference implementation (tests only).

An INDEPENDENT re-implementation of the reference pipeline semantics
(eager pandas + numpy linear algebra + random-restart Lloyd KMeans —
the reference's sklearn stack, minus sklearn which isn't in this
container). The engine's labels are compared against this at F1≥0.99
(BASELINE.md targets). Model components (langid profiles, perplexity
table) are shared by construction — the reference labels are *defined*
with those models; what this oracle re-derives independently is every
pipeline stage: feature extraction, ECDF, min-max, PCA, KMeans,
cluster ranking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .label import QUALITY_WEIGHTS
from .scorers import _langid_impl, _perplexity_impl
from .textstats import EN_STOPWORDS


def _char_ratios(text: str) -> tuple[float, float, float]:
    if not text:
        return 0.0, 0.0, 0.0
    n = len(text)
    sym = sum(1 for ch in text if not (ch.isalnum() or ch.isspace()))
    dig = sum(1 for ch in text if ch.isdigit())
    upp = sum(1 for ch in text if ch.isupper())
    return sym / n, dig / n, upp / n


def features_pd(df: pd.DataFrame, text_col: str = "text", lang_col: str = "lang") -> pd.DataFrame:
    """Heuristic + model features, eager pandas (reference style:
    /root/reference/osmdq/utils.py:422-463 builds per-entity features
    with pandas)."""
    stop = set(EN_STOPWORDS)
    out = pd.DataFrame(index=df.index)
    texts = df[text_col].fillna("")
    rows = []
    for t in texts:
        words = t.split()
        nw = len(words)
        nstop = sum(1 for w in words if w.lower() in stop)
        nonws = sum(len(w) for w in words)
        uniq = len(set(words))
        g5 = [" ".join(words[i : i + 5]) for i in range(nw - 4)] if nw >= 5 else []
        sym, dig, upp = _char_ratios(t)
        rows.append(
            dict(
                n_chars=float(len(t)),
                n_words=float(nw),
                mean_word_len=nonws / nw if nw else 0.0,
                stopword_ratio=nstop / nw if nw else 0.0,
                symbol_ratio=sym,
                digit_ratio=dig,
                upper_ratio=upp,
                dup_word_ratio=1.0 - uniq / nw if nw else 0.0,
                dup_5gram_ratio=1.0 - len(set(g5)) / len(g5) if g5 else 0.0,
            )
        )
    out = pd.DataFrame(rows, index=df.index)
    lid = _langid_impl(texts)
    out["langid_conf"] = lid["langid_conf"].to_numpy()
    out["lang_match"] = (lid["lang_pred"].to_numpy() == df[lang_col].to_numpy()).astype(float)
    out["perplexity"] = _perplexity_impl(texts).to_numpy()
    return out


def ecdf_pd(x: np.ndarray) -> np.ndarray:
    """statsmodels ECDF semantics: P(X <= x) over the sample itself
    (/root/reference/osmdq/utils.py:521-541)."""
    s = np.sort(x)
    return np.searchsorted(s, x, side="right") / len(x)


def minmax_pd(X: np.ndarray) -> np.ndarray:
    mn, mx = X.min(0), X.max(0)
    rng = np.where(mx - mn == 0, 1.0, mx - mn)
    out = (X - mn) / rng
    out[:, mx - mn == 0] = 0.0
    return out


def pca_pd(X: np.ndarray, n_components: int = 0, kmin: int = 3, kmax: int = 8) -> np.ndarray:
    """Covariance-eig PCA, auto-k by cumvar>70% (reference
    compute_pca_variance + optimal_PCA_components)."""
    cov = np.cov(X.T)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    if n_components <= 0:
        cum = np.cumsum(w / w.sum() * 100.0)
        n_components = next((i + 1 for i in range(len(w)) if cum[i] > 70), len(w))
        n_components = min(max(n_components, kmin), kmax)
    return (X - X.mean(0)) @ v[:, :n_components]


def kmeans_pd(X: np.ndarray, k: int, n_init: int = 20, max_iter: int = 300, seed: int = 7):
    """Random-restart Lloyd (the reference's sklearn KMeans n_init
    semantics, /root/reference/osmdq/analysis_tasks.py:744-745)."""
    best_lab, best_c, best_cost = None, None, np.inf
    n = len(X)
    for t in range(n_init):
        rng = np.random.RandomState(seed + t)
        c = X[rng.choice(n, k, replace=False)]
        for _ in range(max_iter):
            d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            lab = d2.argmin(1)
            new = np.array([X[lab == j].mean(0) if (lab == j).any() else c[j] for j in range(k)])
            if np.allclose(new, c):
                c = new
                break
            c = new
        cost = ((X - c[lab]) ** 2).sum()
        if cost < best_cost:
            best_lab, best_c, best_cost = lab, c, cost
    return best_lab, best_c


def reference_labels(pages: pd.DataFrame, k: int = 5, keep_top: int = 1) -> pd.DataFrame:
    """Full oracle pipeline → (url, cluster, keep)."""
    feats = features_pd(pages)
    for c in ["n_chars", "n_words", "mean_word_len", "perplexity"]:
        feats["u_" + c.removeprefix("n_")] = ecdf_pd(feats[c].to_numpy())
    cols = [
        "u_chars",
        "u_words",
        "u_mean_word_len",
        "u_perplexity",
        "stopword_ratio",
        "symbol_ratio",
        "digit_ratio",
        "upper_ratio",
        "dup_word_ratio",
        "dup_5gram_ratio",
        "langid_conf",
        "lang_match",
    ]
    X = minmax_pd(feats[cols].to_numpy())
    P = pca_pd(X, n_components=0)
    lab, _ = kmeans_pd(P, k)
    # rank clusters by composite of mean scaled features (same rule as
    # webdq.label.keep_map, applied to this oracle's own clusters)
    w = np.array([QUALITY_WEIGHTS.get(c, 0.0) for c in cols])
    scores = np.array([X[lab == j].mean(0) @ w if (lab == j).any() else -np.inf for j in range(k)])
    order = sorted(range(k), key=lambda j: (-scores[j], j))
    kept = set(order[:keep_top])
    return pd.DataFrame({"url": pages["url"].to_numpy(), "cluster": lab, "keep": [j in kept for j in lab]})


def reference_host_labels(pages: pd.DataFrame, k: int = 4, keep_top: int = 1) -> pd.DataFrame:
    """Two-level oracle (reference users→elements shape,
    /root/reference/osmdq/utils.py:332-341): per-HOST aggregate
    metadata → ECDF/min-max/PCA/KMeans over hosts → keep per host
    cluster → every page labeled by its host's verdict. Independent
    eager-pandas re-derivation of webdq.hostagg."""
    from .hostagg import HOST_CLUSTER_FEATURES, HOST_ECDF_FEATURES, HOST_QUALITY_WEIGHTS

    feats = features_pd(pages)
    feats["host"] = pages["url"].str.extract(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)")[0].to_numpy()
    feats["warc_ts"] = pd.to_datetime(pages["warc_ts"].to_numpy())
    g = feats.groupby("host")
    ts = g["warc_ts"]
    h = pd.DataFrame(
        {
            "n_pages": g.size(),
            "n_active_days": g["warc_ts"].apply(lambda s: s.dt.date.nunique()),
            "lifespan_days": (ts.max() - ts.min()).dt.total_seconds() / 86400.0,
            "mean_words": g["n_words"].mean(),
            "v10_words": g["n_words"].quantile(0.1),
            "v90_words": g["n_words"].quantile(0.9),
            "mean_stopword_ratio": g["stopword_ratio"].mean(),
            "mean_symbol_ratio": g["symbol_ratio"].mean(),
            "mean_digit_ratio": g["digit_ratio"].mean(),
            "mean_upper_ratio": g["upper_ratio"].mean(),
            "mean_dup_word_ratio": g["dup_word_ratio"].mean(),
            "mean_dup_5gram_ratio": g["dup_5gram_ratio"].mean(),
            "mean_perplexity": g["perplexity"].mean(),
            "mean_langid_conf": g["langid_conf"].mean(),
            "mean_lang_match": g["lang_match"].mean(),
        }
    )
    for c in HOST_ECDF_FEATURES:
        h["u_" + c.removeprefix("n_")] = ecdf_pd(h[c].to_numpy())
    cols = list(HOST_CLUSTER_FEATURES)
    X = minmax_pd(h[cols].to_numpy())
    P = pca_pd(X, n_components=3)
    lab, _ = kmeans_pd(P, k)
    w = np.array([HOST_QUALITY_WEIGHTS.get(c, 0.0) for c in cols])
    scores = np.array([X[lab == j].mean(0) @ w if (lab == j).any() else -np.inf for j in range(k)])
    order = sorted(range(k), key=lambda j: (-scores[j], j))
    kept = set(order[:keep_top])
    host_keep = pd.Series([lab[i] in kept for i in range(len(h))], index=h.index)
    host_cluster = pd.Series(lab, index=h.index)
    return pd.DataFrame(
        {
            "url": pages["url"].to_numpy(),
            "host": feats["host"].to_numpy(),
            "host_cluster": host_cluster.reindex(feats["host"]).to_numpy(),
            "keep": host_keep.reindex(feats["host"]).to_numpy(),
        }
    )


def f1_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    tp = int(np.sum(y_true & y_pred))
    fp = int(np.sum(~y_true & y_pred))
    fn = int(np.sum(y_true & ~y_pred))
    return 2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 1.0
