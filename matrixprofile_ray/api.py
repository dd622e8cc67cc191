"""Top-level single-series API: the reference's ``compute``/``analyze``
dispatch re-expressed over the numpy kernels.

Parity targets: reference compute.py:29-145 (window/threshold/sample_pct
dispatch rules) and analyze.py:173-272 (preprocess → compute → discover
chain). These run driver-side on one series; the distributed equivalents
are the Dataset stages in matrixprofile_ray.pipelines / stages.
"""

from __future__ import annotations

import math
import warnings

import numpy as np

from matrixprofile_ray.core.discover import (
    extract_regimes,
    fluss,
    pmp_top_k_discords,
    pmp_top_k_motifs,
    top_k_discords,
    top_k_motifs,
)
from matrixprofile_ray.core.mpx import mpx, mpx_ab
from matrixprofile_ray.core.preprocess import preprocess as _preprocess
from matrixprofile_ray.core.scrimp import scrimp_plus_plus
from matrixprofile_ray.core.skimp import maximum_subsequence, skimp

__all__ = ["compute", "analyze"]


def _mp_profile(ts, w, query=None, sample_pct=1.0):
    ts = np.asarray(ts, dtype="d")
    if query is not None:
        query = np.asarray(query, dtype="d")
    if sample_pct >= 1:
        if query is not None:
            mp, pi, mpb, pib = mpx_ab(ts, query, w)
            ez = int(math.ceil(w / 4.0))
            join = True
        else:
            mp, pi = mpx(ts, w)
            mpb = pib = None
            ez = 0
            join = False
        return {
            "mp": mp, "pi": pi, "mpb": mpb, "pib": pib,
            "w": w, "ez": ez, "join": join, "sample_pct": 1.0,
            "metric": "euclidean", "algorithm": "mpx",
            "data": {"ts": ts, "query": query},
            "class": "MatrixProfile",
        }
    p = scrimp_plus_plus(ts, w, sample_pct=sample_pct)
    return {
        "mp": p["mp"], "pi": p["pi"], "mpb": None, "pib": None,
        "w": w, "ez": p["ez"], "join": False, "sample_pct": sample_pct,
        "metric": "euclidean", "algorithm": "scrimp++",
        "data": {"ts": ts, "query": None},
        "class": "MatrixProfile",
    }


def compute(ts, windows=None, query=None, sample_pct=1.0, threshold=0.98,
            n_jobs=1, preprocessing_kwargs=None):
    """Reference compute.py dispatch: MP or PMP depending on windows.

    - ``windows`` None + ``threshold`` → maximum_subsequence upper bound,
      then SKIMP over 8..upper (PMP);
    - many windows → SKIMP at sample_pct=1 (query ignored with a warning);
    - one window + sample_pct ≥ 1 → exact MPX (AB join when query given);
    - one window + sample_pct < 1 → SCRIMP++.
    """
    ts = np.asarray(ts, dtype="d")
    if preprocessing_kwargs:
        ts = _preprocess(
            ts,
            preprocessing_kwargs.get("window", 4),
            impute_method=preprocessing_kwargs.get("impute_method", "mean"),
            impute_direction=preprocessing_kwargs.get(
                "impute_direction", "forward"),
            add_noise=preprocessing_kwargs.get("add_noise", True),
        )

    if windows is not None and np.iterable(windows) and len(np.atleast_1d(windows)) > 1:
        if query is not None:
            warnings.warn("Computing PMP - query is ignored!")
        pmp = skimp(ts, windows=list(np.atleast_1d(windows)), sample_pct=1.0)
        pmp["data"] = {"ts": ts}
        return pmp
    if windows is None:
        upper = maximum_subsequence(ts, threshold=threshold)
        if upper < 8:
            raise ValueError("Unable to determine windows for given threshold")
        pmp = skimp(ts, windows=list(range(8, upper + 1)), sample_pct=1.0)
        pmp["data"] = {"ts": ts}
        pmp["threshold"] = threshold
        return pmp
    w = int(np.atleast_1d(windows)[0])
    if w < 4:
        raise ValueError("Windows must be greater than 3")
    return _mp_profile(ts, w, query=query, sample_pct=sample_pct)


def analyze(ts, query=None, windows=None, sample_pct=1.0, threshold=0.98,
            n_jobs=1, preprocessing_kwargs=None, k_motifs=3, k_discords=3,
            with_visuals: bool = False):
    """Reference analyze.py: compute then annotate with motifs + discords
    (and regimes for single-window exact profiles).

    ``with_visuals=True`` additionally returns the visualization panels
    (reference analyze returns (profile, figures); here figures require
    matplotlib, otherwise ASCII-renderable panels — see visualize.py), as
    ``(profile, panels)``. Default returns just the profile dict for
    backward compatibility with the engine's own callers.
    """
    profile = compute(
        ts,
        windows=windows,
        query=query,
        sample_pct=sample_pct,
        threshold=threshold,
        preprocessing_kwargs=preprocessing_kwargs,
    )
    data = profile["data"]["ts"]
    if profile.get("class") == "PMP":
        profile["motifs"] = pmp_top_k_motifs(
            data, profile["pmp"], profile["pmpi"], profile["windows"],
            metric=profile["metric"], k=k_motifs,
        )
        profile["discords"] = pmp_top_k_discords(
            profile["pmp"], profile["windows"], metric=profile["metric"],
            k=k_discords,
        )
        if with_visuals:
            from matrixprofile_ray.visualize import visualize as _viz

            return profile, _viz(profile)
        return profile

    w = profile["w"]
    disc_ez = max(profile["ez"], int(np.ceil(w / 2.0)))
    profile["motifs"] = top_k_motifs(
        data, profile["mp"], profile["pi"], w,
        exclusion_zone=disc_ez, k=k_motifs,
    )
    profile["discords"] = top_k_discords(
        profile["mp"], w, exclusion_zone=disc_ez, k=k_discords
    )
    if not profile["join"] and len(profile["pi"]) > 2 * w:
        cac = fluss(profile["pi"], w)
        profile["cac"] = cac
        profile["regimes"] = extract_regimes(cac, w, 3)
    if with_visuals:
        from matrixprofile_ray.visualize import visualize as _viz

        return profile, _viz(profile)
    return profile
