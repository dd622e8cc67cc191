"""Discovery visualization over profile dicts — figure-level parity.

Parity target: reference visualize.py:26-667. ``visualize(profile)``
dispatches on the profile class exactly as the reference does
(visualize.py:62-117) and returns ONE entry per reference figure, with the
same counts the reference test suite asserts (tests/test_visualize.py):

- MatrixProfile: one stacked figure (ts / query / mp / lmp / rmp panes,
  visualize.py:181-266), plus one figure each for ``cmp`` / ``av``, TWO
  figures for motifs (pair grid + overlay, :441-514) and one 3-pane
  discord figure with a heat strip (:327-383).
- PMP: one quantized heatmap figure (:149-178), two motif figures
  (:518-594) and one figure PER discord (:386-438).
- Statistics: one 2-pane figure (:119-146). ``plot_snippets`` returns one
  figure per snippet (:597-667).

The reference returns matplotlib figures; this sandbox has no matplotlib,
so each figure is built as a backend-neutral ``Panel`` holding ``Axis``
objects (layers / markers / segments / heat matrices — the exact numeric
content the reference draws). When matplotlib IS importable, ``visualize``
renders the same panels to real figures; otherwise the panels themselves
are returned, each with an ASCII ``render()`` so the ``analyze`` UX loop
still closes in a terminal.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "Axis", "Panel", "sparkline", "describe", "is_visualizable",
    "visualize", "plot_stats", "plot_pmp", "plot_mp", "plot_cmp_mp",
    "plot_av_mp", "plot_discords_mp", "plot_discords_pmp",
    "plot_motifs_mp", "plot_motifs_pmp", "plot_snippets",
]

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


class Axis:
    """One subplot: labeled 1-D layers, point markers, overlay segments,
    and an optional 2-D heat matrix (what ``imshow`` would draw)."""

    def __init__(self, ylabel: str = "", title: str = "",
                 layers: dict | None = None,
                 markers: dict | None = None,
                 segments: list | None = None,
                 heat: np.ndarray | None = None,
                 xlabel: str = ""):
        self.ylabel = ylabel
        self.title = title
        self.xlabel = xlabel
        self.layers = {
            k: np.asarray(v, dtype="d") for k, v in (layers or {}).items()
        }
        # markers: name -> list of (x, y) points
        self.markers = {
            k: [(int(x), float(y)) for x, y in v]
            for k, v in (markers or {}).items()
        }
        # segments: (label, start_index, values) overlays on the layer x-axis
        self.segments = [
            (lbl, int(start), np.asarray(vals, dtype="d"))
            for lbl, start, vals in (segments or [])
        ]
        self.heat = None if heat is None else np.asarray(heat, dtype="d")

    def render(self, width: int = 72) -> str:
        head = " / ".join(x for x in (self.ylabel, self.title) if x)
        lines = [f"-- {head or 'axis'} --"]
        for name, vals in self.layers.items():
            lines.append(f"{name:>12} │{sparkline(vals, width)}│")
        if self.heat is not None:
            h = np.atleast_2d(self.heat)
            step = max(1, h.shape[0] // 8)
            for i in range(0, h.shape[0], step):
                lines.append(f"{'heat[' + str(i) + ']':>12} "
                             f"│{sparkline(h[i], width)}│")
        for name, pts in self.markers.items():
            lines.append(f"{name:>12} @ {[p[0] for p in pts]}")
        for lbl, start, vals in self.segments:
            lines.append(f"{lbl:>12} @ [{start}:{start + len(vals)})")
        return "\n".join(lines)


class Panel:
    """One reference FIGURE: a named list of axes (+ legend labels)."""

    def __init__(self, name: str, axes: list[Axis],
                 legend: list[str] | None = None):
        self.name = name
        self.axes = list(axes)
        self.legend = legend or []

    # backward-compat title alias (round-2 Panel had .title)
    @property
    def title(self) -> str:
        return self.name

    def render(self, width: int = 72) -> str:
        lines = [f"== {self.name} =="]
        for ax in self.axes:
            lines.append(ax.render(width))
        if self.legend:
            lines.append("legend: " + ", ".join(self.legend))
        return "\n".join(lines)

    def to_figure(self):  # pragma: no cover - needs matplotlib
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(len(self.axes), 1, sharex=True,
                                figsize=(15, 7))
        if len(self.axes) == 1:
            axs = [axs]
        for ax, spec in zip(axs, self.axes):
            if spec.heat is not None:
                ax.imshow(np.atleast_2d(spec.heat), aspect="auto")
                ax.invert_yaxis()
            for name, vals in spec.layers.items():
                ax.plot(np.arange(len(vals)), vals, label=name)
            for name, pts in spec.markers.items():
                for x, y in pts:
                    ax.plot(x, y, c="r", marker="*", lw=0, markersize=10)
            for lbl, start, vals in spec.segments:
                ax.plot(np.arange(start, start + len(vals)), vals)
            if spec.ylabel:
                ax.set_ylabel(spec.ylabel)
            if spec.title:
                ax.set_title(spec.title)
            if spec.xlabel:
                ax.set_xlabel(spec.xlabel)
        fig.tight_layout()
        return fig


# ----------------------------------------------------------- predicates

def _is_mp(profile) -> bool:
    """reference core.py:664-679 (class tag check)."""
    return isinstance(profile, dict) and (
        profile.get("class") == "MatrixProfile"
        or ("mp" in profile and "class" not in profile)
    )


def _is_pmp(profile) -> bool:
    """reference core.py:682-697."""
    return isinstance(profile, dict) and (
        profile.get("class") == "PMP"
        or ("pmp" in profile and "class" not in profile)
    )


def _is_stats(profile) -> bool:
    """reference core.py:646-661."""
    return isinstance(profile, dict) and profile.get("class") == "Statistics"


def is_visualizable(obj) -> bool:
    """reference visualize.py:42-58."""
    return _is_mp(obj) or _is_pmp(obj) or _is_stats(obj)


def _arraylike(val) -> bool:
    return isinstance(val, (list, tuple, np.ndarray))


def _pad_nan(arr, n: int) -> np.ndarray:
    return np.append(np.asarray(arr, dtype="d"), np.full(n, np.nan))


# ----------------------------------------------------------- figures

def plot_stats(profile) -> Panel:
    """reference visualize.py:119-146: ts pane + one pane of moving_*."""
    moving = {k: v for k, v in profile.items() if k.startswith("moving")}
    return Panel("statistics", [
        Axis(ylabel="Time Series", layers={"ts": profile.get("ts", [])}),
        Axis(ylabel="Moving Statistics", layers=moving),
    ])


def plot_pmp(profile) -> Panel:
    """reference visualize.py:149-178: quantized PMP heatmap
    (``ceil(pmp*256)/256`` clipped at 1, y-inverted imshow)."""
    pmp = np.asarray(profile.get("pmp"), dtype="d")
    depth = 256
    quant = np.ceil(pmp * depth) / depth
    quant[quant > 1] = 1
    return Panel("pan-matrixprofile", [
        Axis(title="Pan-MatrixProfile", xlabel="Profile Index",
             ylabel="Window Size", heat=quant),
    ])


def plot_mp(profile) -> Panel:
    """reference visualize.py:181-266: stacked ts/query/mp/lmp/rmp panes,
    profiles NaN-padded by w-1 to align with the series axis."""
    data = profile.get("data") or {}
    ts, query = data.get("ts"), data.get("query")
    mp, lmp, rmp = (profile.get(k) for k in ("mp", "lmp", "rmp"))

    if not any(_arraylike(v) for v in (ts, query, mp, lmp, rmp)):
        raise ValueError("Object passed has nothing to plot!")
    w = profile.get("w")
    if not isinstance(w, (int, np.integer)):
        raise ValueError("Expecting window size!")

    axes = []
    if _arraylike(ts):
        axes.append(Axis(ylabel="Data", layers={"ts": ts}))
    if _arraylike(query):
        axes.append(Axis(ylabel="Query", layers={"query": query}))
    for label, arr in (("Matrix Profile", mp), ("Left Matrix Profile", lmp),
                       ("Right Matrix Profile", rmp)):
        if _arraylike(arr):
            axes.append(Axis(
                ylabel=label, title=f"Window Size {int(w)}",
                layers={"mp": _pad_nan(arr, int(w) - 1)},
            ))
    return Panel("matrix profile", axes)


def plot_cmp_mp(profile) -> Panel:
    """reference visualize.py:269-295."""
    w = int(profile["w"])
    return Panel("corrected matrix profile", [
        Axis(ylabel="Corrected Matrix Profile", title=f"Window Size {w}",
             layers={"cmp": _pad_nan(profile["cmp"], w - 1)}),
    ])


def plot_av_mp(profile) -> Panel:
    """reference visualize.py:298-324."""
    w = int(profile["w"])
    return Panel("annotation vector", [
        Axis(ylabel="Annotation Vector", title=f"Window Size {w}",
             layers={"av": _pad_nan(profile["av"], w - 1)}),
    ])


def plot_discords_mp(profile) -> Panel:
    """reference visualize.py:327-383: Data pane, 1-row heat strip of the
    (w+1)-NaN-padded profile, and the profile pane with star markers at
    each discord index."""
    mp = np.asarray(profile["mp"], dtype="d")
    w = int(profile["w"])
    ts = (profile.get("data") or {}).get("ts")
    mp_adj = _pad_nan(mp, w + 1)
    markers = {
        "Discord": [(int(i), float(mp_adj[int(i)])) for i in profile["discords"]]
    }
    return Panel("discords", [
        Axis(ylabel="Data", layers={"ts": ts if ts is not None else []}),
        Axis(heat=mp_adj[None, :]),
        Axis(ylabel="Matrix Profile", title=f"Window Size {w}",
             layers={"mp": mp_adj}, markers=markers),
    ], legend=["Discord", "MP"])


def plot_discords_pmp(profile) -> list[Panel]:
    """reference visualize.py:386-438: ONE figure per (mp_idx, idx)
    discord, drawing the pmp row for that window."""
    ts = (profile.get("data") or {}).get("ts")
    windows = profile["windows"]
    pmp = np.asarray(profile["pmp"], dtype="d")
    figures = []
    for discord in profile["discords"]:
        mp_idx, idx = int(discord[0]), int(discord[1])
        w = int(windows[mp_idx])
        row = pmp[mp_idx]
        figures.append(Panel(f"discord w={w} idx={idx}", [
            Axis(ylabel="Data", layers={"ts": ts if ts is not None else []}),
            Axis(heat=row[None, :]),
            Axis(ylabel="Matrix Profile", title=f"Window Size = {w}",
                 layers={"mp": row},
                 markers={"Discord": [(idx, float(row[idx]))]}),
        ], legend=["Discord", "MP"]))
    return figures


def plot_motifs_mp(profile) -> list[Panel]:
    """reference visualize.py:441-514: TWO figures — a len(motifs)×2 grid
    of the motif-pair subsequences, then one overlay pane per motif with
    red motif / black neighbor segments on the full series."""
    w = int(profile["w"])
    motifs = profile["motifs"]
    ts = np.asarray((profile.get("data") or {}).get("ts"), dtype="d")

    grid_axes = []
    for pair_num, motif in enumerate(motifs, start=1):
        for k, idx in enumerate(motif["motifs"]):
            idx = int(idx)
            grid_axes.append(Axis(
                ylabel=f"Motif {pair_num}" if k == 0 else "",
                title=f"Index Start {idx}",
                layers={"subquery": ts[idx:idx + w]},
            ))
    grid = Panel("motif pairs", grid_axes)

    overlay_axes = []
    for pair_num, motif in enumerate(motifs, start=1):
        segments = [
            ("Motif", int(i), ts[int(i):int(i) + w]) for i in motif["motifs"]
        ] + [
            ("Neighbor", int(i), ts[int(i):int(i) + w])
            for i in motif.get("neighbors", [])
        ]
        overlay_axes.append(Axis(
            ylabel=f"Motif {pair_num}", layers={"ts": ts}, segments=segments,
        ))
    overlay = Panel("motif overlay", overlay_axes,
                    legend=["Data", "Motif", "Neighbor"])
    return [grid, overlay]


def plot_motifs_pmp(profile) -> list[Panel]:
    """reference visualize.py:518-594: like plot_motifs_mp but motif
    locations are (window_index, start) pairs into the PMP."""
    windows = profile["windows"]
    motifs = profile["motifs"]
    ts = np.asarray((profile.get("data") or {}).get("ts"), dtype="d")

    grid_axes = []
    for pair_num, motif in enumerate(motifs, start=1):
        for k, loc in enumerate(motif["motifs"]):
            w, idx = int(windows[int(loc[0])]), int(loc[1])
            grid_axes.append(Axis(
                ylabel=f"Motif {pair_num}" if k == 0 else "",
                title=f"Index Start {idx}, Window Size {w}",
                layers={"subquery": ts[idx:idx + w]},
            ))
    grid = Panel("motif pairs", grid_axes)

    overlay_axes = []
    for pair_num, motif in enumerate(motifs, start=1):
        segments = []
        title = ""
        for loc in motif["motifs"]:
            w, idx = int(windows[int(loc[0])]), int(loc[1])
            segments.append(("Motif", idx, ts[idx:idx + w]))
            title = f"Window Size {w}"
        for loc in motif.get("neighbors", []):
            w, idx = int(windows[int(loc[0])]), int(loc[1])
            segments.append(("Neighbor", idx, ts[idx:idx + w]))
        overlay_axes.append(Axis(
            ylabel=f"Motif {pair_num}", title=title,
            layers={"ts": ts}, segments=segments,
        ))
    overlay = Panel("motif overlay", overlay_axes,
                    legend=["Data", "Motif", "Neighbor"])
    return [grid, overlay]


def plot_snippets(snippets, ts) -> list[Panel]:
    """reference visualize.py:597-667: one figure per snippet — the full
    series, contiguous neighbor intervals as overlay segments, and the
    snippet itself as a final red segment."""
    ts = np.asarray(ts, dtype="d")
    figures = []
    for i, snip in enumerate(snippets):
        sid = str(i + 1)
        start = int(snip["index"])
        data = np.asarray(snip["snippet"], dtype="d")

        # collapse the sorted neighbor index list into contiguous runs
        # (reference's interval walk, visualize.py:634-655)
        neighbors = list(snip.get("neighbors", []))
        intervals = []
        if neighbors:
            run_start = neighbors[0]
            prev = neighbors[0]
            for n in neighbors[1:]:
                if n - prev != 1:
                    intervals.append((run_start, prev))
                    run_start = n
                prev = n
            intervals.append((run_start, prev))

        segments = [
            (f"Subsequences Represented by Snippet-{sid}", int(a),
             ts[int(a):int(b) + 1])
            for a, b in intervals
        ] + [(f"Snippet-{sid}", start, data)]
        figures.append(Panel(f"snippet {sid}", [
            Axis(ylabel="Data", title=f"Snippet-{sid}",
                 layers={"ts": ts}, segments=segments),
        ]))
    return figures


# ----------------------------------------------------------- dispatch

def visualize(profile):
    """reference visualize.py:62-117: dispatch on profile class, combine
    the per-view figures in the reference's order. Figure counts match
    reference tests/test_visualize.py exactly."""
    if not is_visualizable(profile):
        raise ValueError(
            "MatrixProfile, Pan-MatrixProfile or Statistics data "
            "structure expected!"
        )

    figures: list[Panel] = []
    if _is_mp(profile):
        figures.append(plot_mp(profile))
        if _arraylike(profile.get("cmp")) and len(profile["cmp"]) > 0:
            figures.append(plot_cmp_mp(profile))
        if _arraylike(profile.get("av")) and len(profile["av"]) > 0:
            figures.append(plot_av_mp(profile))
        if profile.get("motifs"):
            figures.extend(plot_motifs_mp(profile))
        if profile.get("discords") is not None and len(profile["discords"]):
            figures.append(plot_discords_mp(profile))
    if _is_pmp(profile):
        figures.append(plot_pmp(profile))
        if profile.get("motifs"):
            figures.extend(plot_motifs_pmp(profile))
        if profile.get("discords") is not None and len(profile["discords"]):
            figures.extend(plot_discords_pmp(profile))
    if _is_stats(profile):
        figures.append(plot_stats(profile))

    try:  # pragma: no cover - matplotlib not in this sandbox
        import matplotlib  # noqa: F401

        return [p.to_figure() for p in figures]
    except ImportError:
        return figures


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
