"""U7 dashboard consumer: renders the MetricsStore JSON contract to a
standalone HTML page (reference dashboard/app.py:124-310, rebuilt without
Streamlit/Plotly — stdlib-only, atomic writes, meta-refresh polling)."""

import json
import os
import re

from big_data_analytics_project_spark import dashboard as D
from big_data_analytics_project_spark.streaming.bridge import MetricsStore


def _doc(n=12):
    hist = [
        {
            "batch_id": i,
            "n_rows": 10 + i,
            "total_events": 100 * (i + 1),
            "total_views": 40 * (i + 1),
            "conversion_rate": 0.1 + 0.01 * i,
            "mean_predicted_proba": 0.5,
            "rolling_accuracy": 0.6 + 0.02 * i,
            "model_fitted": i > 2,
            "timestamp": 1_700_000_000.0 + i,
        }
        for i in range(n)
    ]
    return {"current": hist[-1], "history": hist}


def test_render_contains_current_metrics_and_charts():
    page = D.render_dashboard_html(_doc())
    assert page.startswith("<!doctype html>")
    # tiles show the latest batch's values
    assert "1,200" in page  # total_events of batch 11
    assert "21.00%" in page  # conversion_rate 0.21
    assert "fitted ✓" in page
    # one polyline per trend chart, with a point (and tooltip) per batch
    assert page.count("<polyline") == 2
    assert page.count("<title>batch 0:") == 2
    # single-series charts: titles carry identity, no legend element
    assert "Conversion rate — last 50 batches" in page
    assert "legend" not in page.lower()
    # table view of the last 10 batches exists (accessibility fallback)
    assert page.count("<tr><td") == 10
    # polling refresh is embedded
    assert 'http-equiv="refresh" content="2"' in page


def test_render_empty_store_is_a_valid_waiting_page():
    page = D.render_dashboard_html({})
    assert "waiting" in page
    assert "<table" not in page
    assert "–" in page  # null tiles render a placeholder, not a crash


def test_history_is_windowed_to_50_points():
    page = D.render_dashboard_html(_doc(n=80))
    # 50 chart points per trend, 10 table rows, 80 recorded
    assert page.count('class="pt"') == 100
    assert page.count("<tr><td") == 10
    assert "80 batches recorded" in page


def test_sparkline_coordinates_are_monotone_in_x():
    page = D.render_dashboard_html(_doc())
    poly = re.search(r'<polyline class="line" points="([^"]+)"', page).group(1)
    xs = [float(p.split(",")[0]) for p in poly.split()]
    assert xs == sorted(xs)
    ys = [float(p.split(",")[1]) for p in poly.split()]
    # conversion rate rises linearly → y must fall monotonically (svg y-down)
    assert ys == sorted(ys, reverse=True)


def test_write_dashboard_reads_store_and_replaces_atomically(tmp_path):
    metrics = tmp_path / "metrics.json"
    out = tmp_path / "dash.html"
    store = MetricsStore(str(metrics))
    for h in _doc(5)["history"]:
        store.update(h)
    page = D.write_dashboard(str(metrics), str(out))
    assert out.read_text() == page
    assert "4" in page  # latest batch id rendered
    # a second render replaces in place (no stray tmp files left behind)
    D.write_dashboard(str(metrics), str(out))
    leftovers = [p for p in os.listdir(tmp_path) if p.startswith("tmp")]
    assert leftovers == []


def test_write_dashboard_without_metrics_file(tmp_path):
    out = tmp_path / "dash.html"
    page = D.write_dashboard(str(tmp_path / "missing.json"), str(out))
    assert "waiting" in page and out.exists()


def test_watch_polls_and_rerenders(tmp_path):
    metrics = tmp_path / "metrics.json"
    out = tmp_path / "dash.html"
    metrics.write_text(json.dumps(_doc(3)))
    n = D.watch(str(metrics), str(out), interval_sec=0.01, max_iterations=3)
    assert n == 3
    assert "2" in out.read_text()


def test_string_valued_metric_renders_escaped_not_crashing():
    # metrics JSON is externally produced: a string (even a hostile one)
    # in a numeric slot must render escaped, not raise ValueError on f"{v:,}"
    doc = _doc(3)
    doc["current"] = dict(doc["current"], total_views="<script>alert(1)</script>")
    doc["history"][0]["total_views"] = "n/a <b>"
    page = D.render_dashboard_html(doc)
    assert "<script>alert(1)</script>" not in page
    assert "&lt;script&gt;" in page
    assert "n/a &lt;b&gt;" in page
