"""Report surface (pipeline/reports.py): the reference's chart output
(`Code/flight_analysis.py:150-185`) re-emitted as dependency-free
SVG + JSON artifacts from the same bounded aggregate frames."""

from __future__ import annotations

import json
import os

import pytest

from bigdata_flightanalysis_spark.pipeline import flights as P
from bigdata_flightanalysis_spark.pipeline.reports import (
    bar_chart_svg,
    grouped_bar_chart_svg,
    write_flight_report,
)
from tests.flight_fixtures import raw_2019, raw_2023


def test_bar_chart_svg_shapes():
    svg = bar_chart_svg(["2019", "2023"], [0.74, 0.72],
                        title="Silhouette", y_max=1.0)
    assert svg.count("<rect") == 3  # background + 2 bars
    assert "0.74" in svg and "0.72" in svg
    assert svg.startswith("<svg") and svg.endswith("</svg>")


def test_bar_chart_svg_negative_values_draw_below_baseline():
    # silhouette scores range [-1, 1]: a negative score must render as a
    # visible bar below the zero baseline, not clamp to zero height
    svg = bar_chart_svg(["a", "b"], [0.5, -0.4], title="t")
    import re

    rects = re.findall(r'<rect x="([\d.]+)" y="([\d.]+)" width="[\d.]+" '
                       r'height="([\d.]+)"', svg)
    assert len(rects) == 2
    heights = [float(h) for _, _, h in rects]
    assert all(h > 10 for h in heights)  # both bars visibly drawn
    # the negative bar starts AT the baseline (its y == zero line y)
    zero_line = re.search(r'<line x1="\d+" y1="([\d.]+)"', svg)
    assert zero_line is not None
    neg_y = float(rects[1][1])
    assert neg_y == pytest.approx(float(zero_line.group(1)), abs=0.1)
    assert "-0.4" in svg  # numeric label still visible


def test_grouped_bar_chart_numeric_x_sorts_numerically():
    # cluster ids >= 10 must not sort lexically (0,1,10,2)
    rows = [
        {"k": i, "n": 1, "h": "x"} for i in (10, 2, 0, 1)
    ]
    svg = grouped_bar_chart_svg(rows, x="k", y="n", hue="h", title="t")
    import re

    labels = [m for m in re.findall(r">(\d+)</text>", svg)]
    assert labels == ["0", "1", "2", "10"]


def test_grouped_bar_chart_svg_groups_and_legend():
    rows = [
        {"prediction": 0, "count": 10, "reason": "Weather"},
        {"prediction": 0, "count": 4, "reason": "Carrier"},
        {"prediction": 1, "count": 7, "reason": "Weather"},
    ]
    svg = grouped_bar_chart_svg(rows, x="prediction", y="count",
                                hue="reason", title="Reasons")
    # background + 3 bars + 2 legend swatches
    assert svg.count("<rect") == 6
    assert "Weather" in svg and "Carrier" in svg
    # XML-escaping sanity
    assert "&" not in svg.replace("&amp;", "").replace("&lt;", "").replace(
        "&gt;", ""
    ).replace("&quot;", "")


@pytest.fixture(scope="module")
def result(spark):
    return P.run_flight_pipeline(
        raw_2019(spark), raw_2023(spark), mode="compat"
    )


def test_write_flight_report_artifacts(result, tmp_path):
    out = str(tmp_path / "report")
    written = write_flight_report(result, out)
    names = {os.path.basename(p) for p in written}
    assert names == {
        "silhouette_scores.svg", "silhouette_scores.json",
        "reasons_2019.svg", "reasons_2019.json",
        "reasons_2023.svg", "reasons_2023.json",
        "top_airlines_2023.svg", "top_airlines_2023.json",
        "index.html",
    }
    scores = json.load(open(os.path.join(out, "silhouette_scores.json")))
    assert scores["2019"] == pytest.approx(result.silhouette_2019)
    reasons = json.load(open(os.path.join(out, "reasons_2019.json")))
    assert reasons and all(
        {"prediction", "CancellationReason", "count"} <= set(r) for r in reasons
    )
    # every emitted SVG parses as XML (well-formed artifacts)
    import xml.etree.ElementTree as ET

    for p in written:
        if p.endswith(".svg"):
            ET.parse(p)
    html = open(os.path.join(out, "index.html")).read()
    assert html.count("<img") == 4
