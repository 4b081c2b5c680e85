"""Disentanglement metric suite (host-side, sklearn/scipy).

Same five metrics and the same estimator choices as the reference
``utils/evaluation.py:8-233``: Interpretability (argmax-MI dim +
linear-regression R²), MIG, Modularity (Ridgeway & Mozer), SCC
(p-gated Spearman), SAP. The kNN-based ``mutual_info_regression``
drives Interpretability/MIG/Modularity, so these stay sklearn on host
(SURVEY.md §7 "sklearn metric fidelity") — only the latent harvest that
feeds them is TPU work.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import spearmanr
from sklearn.feature_selection import mutual_info_regression
from sklearn.linear_model import LinearRegression

EVAL_METRIC_DICT = {
    "interpretability": "Interpretability",
    "modularity_score": "Modularity",
    "mig": "MIG",
    "SAP_score": "SAP",
    "Corr_score": "SCC",
}


def _mi_profiles(latent_codes: np.ndarray, attributes: np.ndarray) -> list:
    """One kNN-MI profile per attribute: element ``a`` is the vector of
    MI(latent dim d ; attribute a) over all latent dims.

    Attribute-major (list of per-attribute vectors) rather than a
    code-by-attribute matrix; the estimator calls — and therefore the
    numeric results — match the reference's matrix build
    (evaluation.py:32-43) because kNN MI is computed per attribute
    column in the same order either way.
    """
    return [mutual_info_regression(latent_codes, a) for a in attributes.T]


def compute_interpretability_metric(latent_codes, attributes, attr_list):
    """Per-attribute (best latent dim by MI, linear R² on that dim) + mean.

    Output schema matches reference evaluation.py:72-93 exactly:
    ``{attr: (dim, score), ..., "mean": (-1, mean_score)}``.
    """
    interpretability_metrics = {}
    total = 0.0
    for i, attr_name in enumerate(attr_list):
        attr_labels = attributes[:, i]
        mutual_info = mutual_info_regression(latent_codes, attr_labels)
        dim = int(np.argmax(mutual_info))
        reg = LinearRegression().fit(latent_codes[:, dim : dim + 1], attr_labels)
        score = float(reg.score(latent_codes[:, dim : dim + 1], attr_labels))
        interpretability_metrics[attr_name] = (dim, score)
        total += score
    interpretability_metrics["mean"] = (-1, total / len(attr_list))
    return interpretability_metrics


def compute_mig(latent_codes, attributes):
    """Mutual information gap: per attribute, the gap between the two
    most-informative latent dims, normalised by the attribute's own
    kNN-entropy estimate (self-MI), averaged over attributes.

    Same estimator and result as reference evaluation.py:96-110; built
    from per-attribute top-2 partitions instead of a sorted MI matrix.
    """
    profiles = _mi_profiles(latent_codes, attributes)
    entropies = [
        mutual_info_regression(a.reshape(-1, 1), a)[0] for a in attributes.T
    ]
    gaps = []
    for profile, h in zip(profiles, entropies):
        second, best = np.partition(profile, profile.size - 2)[-2:]
        if h <= 0.0:
            # A (near-)constant attribute column has zero self-MI: no
            # latent dim can carry information about it, so its gap is
            # 0 rather than 0/0 = nan silently landing in
            # results_dict.json (ADVICE r3).
            import warnings

            warnings.warn(
                "compute_mig: attribute with zero kNN self-entropy; "
                "its gap contributes 0",
                RuntimeWarning,
            )
            gaps.append(0.0)
        else:
            gaps.append((best - second) / h)
    return {"mig": float(np.mean(gaps))}


def compute_modularity(latent_codes, attributes):
    """Modularity (Ridgeway & Mozer): a latent dim is modular when its
    squared MI mass concentrates on a single attribute. Per dim,
    1 - (off-target squared-MI) / (ideal one-hot off-target bound); dims
    carrying no MI at all score 0. Mean over dims.

    Same estimator and result as reference evaluation.py:113-140,
    computed per latent dim rather than via masked matrix algebra.
    """
    profiles = np.stack(_mi_profiles(latent_codes, attributes))
    per_dim = []
    for dim_profile in profiles.T:  # MI of one latent dim vs every attribute
        energy = dim_profile**2
        best = energy.max()
        if best == 0.0:
            per_dim.append(0.0)
        else:
            off_target = energy.sum() - best
            per_dim.append(1.0 - off_target / (best * (energy.size - 1.0)))
    return {"modularity_score": float(np.mean(per_dim))}


def _compute_correlation_matrix(mus, ys):
    num_latent_codes = mus.shape[1]
    num_attributes = ys.shape[1]
    score_matrix = np.zeros([num_latent_codes, num_attributes])
    for i in range(num_latent_codes):
        for j in range(num_attributes):
            rho, p = spearmanr(mus[:, i], ys[:, j])
            score_matrix[i, j] = np.abs(rho) if p <= 0.05 else 0.0
    return score_matrix


def compute_correlation_score(latent_codes, attributes):
    """Spearman correlation score, p ≤ .05 gated
    (reference evaluation.py:143-173)."""
    corr_matrix = _compute_correlation_matrix(latent_codes, attributes)
    return {"Corr_score": float(np.mean(np.max(corr_matrix, axis=0)))}


def _compute_score_matrix(mus, ys):
    num_latent_codes = mus.shape[1]
    num_attributes = ys.shape[1]
    score_matrix = np.zeros([num_latent_codes, num_attributes])
    for i in range(num_latent_codes):
        for j in range(num_attributes):
            cov = np.cov(mus[:, i], ys[:, j], ddof=1)
            cov_mu_y = cov[0, 1] ** 2
            var_mu = cov[0, 0]
            var_y = cov[1, 1]
            # var_y == 0 (an exactly-constant attribute column) would
            # make this 0/0 = nan and poison SAP_score in
            # results_dict.json — the same degenerate input the MIG
            # zero-entropy guard covers; no information, score 0
            if var_mu > 1e-12 and var_y > 1e-12:
                score_matrix[i, j] = cov_mu_y / (var_mu * var_y)
            else:
                score_matrix[i, j] = 0.0
    return score_matrix


def _compute_avg_diff_top_two(matrix):
    sorted_matrix = np.sort(matrix, axis=0)
    return float(np.mean(sorted_matrix[-1, :] - sorted_matrix[-2, :]))


def compute_sap_score(latent_codes, attributes):
    """Separated attribute predictability (reference evaluation.py:176-219)."""
    score_matrix = _compute_score_matrix(latent_codes, attributes)
    assert score_matrix.shape[0] == latent_codes.shape[1]
    assert score_matrix.shape[1] == attributes.shape[1]
    return {"SAP_score": _compute_avg_diff_top_two(score_matrix)}


def normalize_data(data, mean=None, stddev=None):
    """z-score normalization (reference evaluation.py:222-233)."""
    if mean is None:
        mean = np.mean(data, axis=0)
    if stddev is None:
        stddev = np.std(data, axis=0)
    return (data - mean[np.newaxis, :]) / stddev[np.newaxis, :], mean, stddev
