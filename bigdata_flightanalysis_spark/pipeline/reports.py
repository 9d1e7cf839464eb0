"""Report surface — the reference's end product, engine-side.

The reference finishes by ``toPandas()``-ing the small aggregate
frames and drawing matplotlib/seaborn bar charts
(``Code/flight_analysis.py:150-185``): a silhouette bar per year and a
grouped bar of (cluster × reason) counts. This module reproduces that
surface without a plotting dependency: every chart is emitted as a
self-contained SVG plus its chart data (JSON), so the artifacts are
diffable, testable, and renderable anywhere.

Scale posture: only ALREADY-AGGREGATED frames ever reach the driver
(the same ``limit``-bounded frames the reference plots — k×reasons
rows, never fact rows), so the report stage costs nothing at 100 TB.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame

# Deterministic categorical palette (seaborn-viridis-ish hexes).
PALETTE = [
    "#440154", "#414487", "#2a788e", "#22a884", "#7ad151",
    "#fde725", "#f89540", "#cc4778",
]

_W, _H = 640, 360
_ML, _MR, _MT, _MB = 60, 20, 40, 60  # margins: left/right/top/bottom


def _esc(s: object) -> str:
    return (
        str(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _svg_header(title: str) -> list[str]:
    return [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif">',
        f'<rect width="{_W}" height="{_H}" fill="white"/>',
        f'<text x="{_W / 2}" y="24" text-anchor="middle" font-size="16">'
        f"{_esc(title)}</text>",
    ]


def _axis_sort_key(v: object) -> tuple:
    """Type-aware axis ordering: numbers numerically (cluster id 10
    after 2, not after 1), then strings lexically, Nones last."""
    is_num = isinstance(v, (int, float)) and not isinstance(v, bool)
    return (v is None, not is_num, v if is_num else str(v))


def bar_chart_svg(
    categories: Sequence[object],
    values: Sequence[float],
    *,
    title: str,
    y_max: float | None = None,
) -> str:
    """Plain bar chart (the silhouette-scores chart,
    ``Code/flight_analysis.py:157-165``).

    Negative values (silhouette scores range [-1, 1]) draw below a zero
    baseline, matching the reference's matplotlib behavior, rather than
    clamping to an invisible zero-height bar.
    """
    if len(categories) != len(values):
        raise ValueError("categories/values length mismatch")
    y_top = y_max if y_max is not None else max([*values, 0.0]) * 1.1 or 1.0
    y_bot = min([*values, 0.0]) * 1.1
    span = (y_top - y_bot) or 1.0
    plot_w, plot_h = _W - _ML - _MR, _H - _MT - _MB
    zero_y = _MT + (y_top / span) * plot_h
    n = max(len(values), 1)
    band = plot_w / n
    out = _svg_header(title)
    for i, (cat, val) in enumerate(zip(categories, values)):
        h = abs(val) / span * plot_h
        x = _ML + i * band + band * 0.15
        y = zero_y - h if val >= 0 else zero_y
        color = PALETTE[i % len(PALETTE)]
        out.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{band * 0.7:.1f}" '
            f'height="{h:.1f}" fill="{color}"/>'
        )
        out.append(
            f'<text x="{x + band * 0.35:.1f}" y="{_MT + plot_h + 16}" '
            f'text-anchor="middle" font-size="12">{_esc(cat)}</text>'
        )
        label_y = y - 4 if val >= 0 else y + h + 12
        # integer values (counts) render in full — .3g would show
        # 12345 as '1.23e+04'; floats keep 3 significant digits
        label = f"{val:d}" if isinstance(val, int) else (
            f"{int(val):d}" if float(val).is_integer() else f"{val:.3g}"
        )
        out.append(
            f'<text x="{x + band * 0.35:.1f}" y="{label_y:.1f}" '
            f'text-anchor="middle" font-size="11">{label}</text>'
        )
    out.append(
        f'<line x1="{_ML}" y1="{zero_y:.1f}" x2="{_W - _MR}" '
        f'y2="{zero_y:.1f}" stroke="black"/>'
    )
    out.append("</svg>")
    return "\n".join(out)


def grouped_bar_chart_svg(
    rows: Sequence[dict],
    *,
    x: str,
    y: str,
    hue: str,
    title: str,
) -> str:
    """Grouped bar chart (the seaborn ``barplot(x=prediction, y=count,
    hue=reason)`` shape, ``Code/flight_analysis.py:168-185``)."""
    x_vals = sorted({r[x] for r in rows}, key=_axis_sort_key)
    hues = sorted({r[hue] for r in rows}, key=_axis_sort_key)
    y_top = max([float(r[y]) for r in rows] + [0.0]) * 1.1 or 1.0
    plot_w, plot_h = _W - _ML - _MR, _H - _MT - _MB
    band = plot_w / max(len(x_vals), 1)
    bar_w = band * 0.8 / max(len(hues), 1)
    lookup = {(r[x], r[hue]): float(r[y]) for r in rows}
    out = _svg_header(title)
    for i, xv in enumerate(x_vals):
        for j, hv in enumerate(hues):
            val = lookup.get((xv, hv))
            if val is None:
                continue
            h = max(0.0, val / y_top) * plot_h
            px = _ML + i * band + band * 0.1 + j * bar_w
            py = _MT + plot_h - h
            out.append(
                f'<rect x="{px:.1f}" y="{py:.1f}" width="{bar_w * 0.9:.1f}" '
                f'height="{h:.1f}" fill="{PALETTE[j % len(PALETTE)]}">'
                f"<title>{_esc(xv)} / {_esc(hv)}: {val:g}</title></rect>"
            )
        out.append(
            f'<text x="{_ML + i * band + band / 2:.1f}" '
            f'y="{_MT + plot_h + 16}" text-anchor="middle" font-size="12">'
            f"{_esc(xv)}</text>"
        )
    for j, hv in enumerate(hues):  # legend
        ly = _MT + j * 16
        out.append(
            f'<rect x="{_W - _MR - 150}" y="{ly}" width="12" height="12" '
            f'fill="{PALETTE[j % len(PALETTE)]}"/>'
        )
        out.append(
            f'<text x="{_W - _MR - 134}" y="{ly + 10}" font-size="11">'
            f"{_esc(hv)}</text>"
        )
    out.append(
        f'<line x1="{_ML}" y1="{_MT + plot_h}" x2="{_W - _MR}" '
        f'y2="{_MT + plot_h}" stroke="black"/>'
    )
    out.append("</svg>")
    return "\n".join(out)


def frame_chart_data(df: DataFrame, limit: int = 100) -> list[dict]:
    """Bounded driver materialization of an aggregate frame — the
    ``toPandas().limit(20)`` step of the reference, with an explicit
    cap so a report can never pull fact-scale data to the driver."""
    return [r.asDict() for r in df.limit(limit).collect()]


def write_flight_report(result, out_dir: str, *, limit: int = 100) -> list[str]:
    """Emit the reference's full report (silhouette bars + grouped
    reason bars per year + top-airlines bars) as SVG + JSON artifacts.

    ``result`` is a ``FlightPipelineResult``. Returns written paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []

    def emit(name: str, svg: str, data: object) -> None:
        svg_path = os.path.join(out_dir, f"{name}.svg")
        json_path = os.path.join(out_dir, f"{name}.json")
        with open(svg_path, "w") as f:
            f.write(svg)
        with open(json_path, "w") as f:
            json.dump(data, f, indent=2, default=str)
        written.extend([svg_path, json_path])

    scores = {
        "2019": result.silhouette_2019,
        "2023": result.silhouette_2023,
    }
    emit(
        "silhouette_scores",
        bar_chart_svg(
            list(scores), list(scores.values()),
            title="Silhouette Scores for KMeans Clustering", y_max=1.0,
        ),
        scores,
    )
    for name, frame, hue, title in (
        ("reasons_2019", result.reasons_2019, "CancellationReason",
         "Top Reasons for Delays/Cancellations (2019)"),
        ("reasons_2023", result.reasons_2023, "DelayReason",
         "Top Reasons for Delays (2023)"),
    ):
        rows = frame_chart_data(frame, limit)
        emit(
            name,
            grouped_bar_chart_svg(
                rows, x="prediction", y="count", hue=hue, title=title
            ),
            rows,
        )
    airlines = frame_chart_data(result.top_airlines_2023, limit)
    emit(
        "top_airlines_2023",
        bar_chart_svg(
            [r["Airline"] for r in airlines],
            [float(r["count"]) for r in airlines],
            title="Top Airlines by Cancellations (2023)",
        ),
        airlines,
    )
    index = os.path.join(out_dir, "index.html")
    with open(index, "w") as f:
        f.write(
            "<!doctype html><title>Flight analysis report</title>\n"
            + "\n".join(
                f'<p><img src="{os.path.basename(p)}" alt="{os.path.basename(p)}"></p>'
                for p in written
                if p.endswith(".svg")
            )
        )
    written.append(index)
    return written
