"""Discovery visualization over profile dicts.

Parity target: reference visualize.py:62-667 — ``visualize(profile)``
dispatches on the profile class and returns one panel per view (series,
matrix profile, motifs, discords, PMP heatmap). The reference returns
matplotlib figures; this sandbox has no matplotlib, so each view is built
as a backend-neutral PANEL (title + labeled numeric layers). When
matplotlib IS importable, ``visualize`` renders the same panels to figures;
otherwise it returns the panels themselves, each with an ASCII ``render()``
so the `analyze` UX loop still closes in a terminal.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Panel", "visualize", "sparkline", "describe"]

_BLOCKS = "▁▂▃▄▅▆▇█"


def sparkline(values, width: int = 72) -> str:
    """ASCII sparkline of a numeric series (NaN/inf → gap)."""
    arr = np.asarray(values, dtype="d")
    if arr.size == 0:
        return ""
    if arr.size > width:
        # bucket means preserve shape at terminal width
        edges = np.linspace(0, arr.size, width + 1).astype(int)
        arr = np.array([
            np.nanmean(arr[a:b]) if b > a else np.nan
            for a, b in zip(edges[:-1], edges[1:])
        ])
    finite = np.isfinite(arr)
    if not finite.any():
        return " " * len(arr)
    lo, hi = np.min(arr[finite]), np.max(arr[finite])
    span = (hi - lo) or 1.0
    idx = ((arr - lo) / span * (len(_BLOCKS) - 1)).astype("i8")
    return "".join(
        _BLOCKS[i] if ok else " " for i, ok in zip(idx, finite)
    )


class Panel:
    """One visualization view: a title, numeric layers, and markers."""

    def __init__(self, title: str, layers: dict[str, np.ndarray],
                 markers: dict[str, list[int]] | None = None):
        self.title = title
        self.layers = {k: np.asarray(v, dtype="d") for k, v in layers.items()}
        self.markers = markers or {}

    def render(self, width: int = 72) -> str:
        lines = [f"== {self.title} =="]
        for name, vals in self.layers.items():
            lines.append(f"{name:>12} │{sparkline(vals, width)}│")
        for name, idxs in self.markers.items():
            lines.append(f"{name:>12} @ {list(map(int, idxs))}")
        return "\n".join(lines)

    def to_figure(self):  # pragma: no cover - needs matplotlib
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        for name, vals in self.layers.items():
            ax.plot(vals, label=name)
        for name, idxs in self.markers.items():
            for i in idxs:
                ax.axvline(i, linestyle="--", alpha=0.4)
        ax.set_title(self.title)
        ax.legend()
        return fig


def _is_mp(profile: dict) -> bool:
    return profile.get("class") == "MatrixProfile" or "mp" in profile


def _is_pmp(profile: dict) -> bool:
    return profile.get("class") == "PMP" or "pmp" in profile


def describe(profile: dict) -> dict:
    """Flat numeric summary of a profile (always available)."""
    out = {"class": profile.get("class", "MatrixProfile")}
    mp = profile.get("mp")
    if mp is not None:
        mp = np.asarray(mp, dtype="d")
        finite = mp[np.isfinite(mp)]
        out.update(
            mp_len=int(mp.size),
            mp_min=float(finite.min()) if finite.size else float("nan"),
            mp_max=float(finite.max()) if finite.size else float("nan"),
            mp_argmin=int(np.nanargmin(np.where(np.isfinite(mp), mp, np.nan)))
            if finite.size else -1,
        )
    if profile.get("w") is not None:
        out["w"] = int(profile["w"])
    if profile.get("windows") is not None:
        out["windows"] = [int(w) for w in profile["windows"]]
    return out


def visualize(profile: dict):
    """Profile dict → list of panels (or matplotlib figures if available).

    Views mirror the reference dispatch (visualize.py:62-130): raw series,
    matrix profile, motifs, discords for MP profiles; PMP row panels for
    pan-profiles; cmp/av when present.
    """
    panels: list[Panel] = []
    data = profile.get("data") or {}
    ts = data.get("ts")

    if _is_pmp(profile):
        pmp = np.asarray(profile["pmp"], dtype="d")
        if ts is not None:
            panels.append(Panel("series", {"ts": ts}))
        windows = profile.get("windows")
        for i, row in enumerate(np.atleast_2d(pmp)):
            w = int(windows[i]) if windows is not None else i
            panels.append(Panel(f"pmp w={w}", {"pmp": row}))
    elif _is_mp(profile):
        if ts is not None:
            panels.append(Panel("series", {"ts": ts}))
        mp = np.asarray(profile["mp"], dtype="d")
        panels.append(Panel("matrix profile", {"mp": mp}))
        if profile.get("cmp") is not None:
            panels.append(Panel("corrected mp", {"cmp": profile["cmp"]}))
        if profile.get("av") is not None:
            panels.append(Panel("annotation vector", {"av": profile["av"]}))
        motifs = profile.get("motifs")
        if motifs:
            idxs = []
            for m in motifs:
                idxs.extend(int(np.atleast_1d(i)[0]) for i in m.get("motifs", []))
            panels.append(Panel("motifs", {"mp": mp}, {"motif": idxs}))
        discords = profile.get("discords")
        if discords is not None and len(discords):
            idxs = [int(np.atleast_1d(d)[0]) for d in discords]
            panels.append(Panel("discords", {"mp": mp}, {"discord": idxs}))
    else:
        raise ValueError("unsupported profile structure for visualize()")

    try:  # pragma: no cover - matplotlib not in this sandbox
        import matplotlib  # noqa: F401

        return [p.to_figure() for p in panels]
    except ImportError:
        return panels
