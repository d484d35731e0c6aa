"""Rank correlations and model<->human score matching.

Capability parity with ref ``eval.py:297-347`` (``compute_spearman_correlation``)
and ``utils.py:1167-1214``: model scores are distances (lower better), human
MOS are higher-better, so reported correlations are sign-inverted. Name
matching is two-stage: exact normalized-name match, then a last-2-parts /
last-part suffix fallback, preserving the reference's first-match iteration
order.
"""

from __future__ import annotations

import typing as T

import numpy as np
from scipy.stats import pearsonr, spearmanr

from ..utils.names import norm_name


def spearman(a: np.ndarray, b: np.ndarray) -> T.Tuple[float, float]:
    corr, p = spearmanr(a, b)
    return float(corr), float(p)


def pearson(a: np.ndarray, b: np.ndarray) -> T.Tuple[float, float]:
    corr, p = pearsonr(a, b)
    return float(corr), float(p)


def match_scores(
    model_scores: T.Dict[str, float],
    human_scores: T.Dict[str, T.Dict[str, float]],
    human_key: str,
) -> T.Tuple[T.List[float], T.List[float], T.List[T.Tuple[str, str]]]:
    """Pair model scores with human scores by normalized video name, with the
    reference's suffix fallback (ref ``eval.py:312-331``)."""
    model_by_name = {norm_name(k): v for k, v in model_scores.items()}
    model_values: T.List[float] = []
    human_values: T.List[float] = []
    matched: T.List[T.Tuple[str, str]] = []

    for human_name, human_data in human_scores.items():
        if human_key not in human_data:
            continue
        hnorm = norm_name(human_name)
        if hnorm in model_by_name:
            model_values.append(model_by_name[hnorm])
            human_values.append(human_data[human_key])
            matched.append((hnorm, human_name))
            continue
        hparts = hnorm.split("_")
        for mnorm, mscore in model_by_name.items():
            mparts = mnorm.split("_")
            if len(mparts) >= 2 and len(hparts) >= 2:
                if mparts[-2:] == hparts[-2:] or mparts[-1] == hparts[-1]:
                    model_values.append(mscore)
                    human_values.append(human_data[human_key])
                    matched.append((mnorm, human_name))
                    break
    return model_values, human_values, matched


def match_and_correlate(
    model_scores: T.Dict[str, float],
    human_scores: T.Dict[str, T.Dict[str, float]],
    human_key: str,
) -> T.Dict[str, T.Any]:
    """Sign-inverted Spearman/Pearson vs human MOS; None if < 2 matches."""
    mv, hv, matched = match_scores(model_scores, human_scores, human_key)
    if len(mv) < 2:
        return {"spearman": None, "pearson": None, "p_value": None, "n": len(mv)}
    s, p_val = spearman(np.array(mv), np.array(hv))
    r, _ = pearson(np.array(mv), np.array(hv))
    s = -s if not np.isnan(s) else None
    r = -r if not np.isnan(r) else None
    return {
        "spearman": s,
        "pearson": r,
        "p_value": p_val,
        "n": len(matched),
        "matched": matched,
    }


def correlate_with_class_fallback(
    model_scores: T.Dict[str, float],
    human_scores: T.Dict[str, T.Dict[str, float]],
    human_key: str,
    known_classes: T.Iterable[str],
) -> T.Dict[str, T.Any]:
    """Train-monitor variant (ref ``utils.py:1167-1214``): unmatched human
    entries fall back to the class-mean of the model scores for the class
    inferred from the human video's name."""
    from ..utils.names import infer_class_from_name

    model_by_name = {norm_name(k): v for k, v in model_scores.items()}
    class_scores: T.Dict[str, T.List[float]] = {}
    for k, v in model_by_name.items():
        cls = infer_class_from_name(k, known_classes)
        if cls is not None:
            class_scores.setdefault(cls, []).append(v)
    class_means = {c: float(np.mean(vs)) for c, vs in class_scores.items() if vs}

    mv: T.List[float] = []
    hv: T.List[float] = []
    for human_name, human_data in human_scores.items():
        if human_key not in human_data:
            continue
        hnorm = norm_name(human_name)
        hcls = infer_class_from_name(hnorm, known_classes)
        if hnorm in model_by_name:
            mv.append(model_by_name[hnorm])
            hv.append(human_data[human_key])
        elif hcls and hcls in class_means:
            mv.append(class_means[hcls])
            hv.append(human_data[human_key])

    if len(mv) < 2:
        return {"spearman": None, "pearson": None, "n": len(mv)}
    s, _ = spearman(np.array(mv), np.array(hv))
    r, _ = pearson(np.array(mv), np.array(hv))
    return {
        "spearman": -s if not np.isnan(s) else None,
        "pearson": -r if not np.isnan(r) else None,
        "n": len(mv),
    }
