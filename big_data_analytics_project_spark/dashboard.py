"""Static-HTML metrics dashboard — the U7 consumer of the metrics sink.

Reference: ``dashboard/app.py:124-310`` is a Streamlit page that polls the
metrics JSON every few seconds and renders metric tiles (views / events /
conversion rate / batch id / last update), a conversion-rate-over-time
line of the last 50 batches, a model-performance row, and a recent-batch
table.

Rebuild: the same poll-and-render contract with ZERO dependencies — a
pure-stdlib generator that reads the :class:`~.streaming.bridge.MetricsStore`
JSON document (``{"current": {...}, "history": [...]}``) and writes a
self-contained HTML page (inline SVG charts, CSS-only light/dark theming,
``<meta http-equiv="refresh">`` polling).  ``watch()`` is the long-running
consumer loop the reference runs inside Streamlit; ``write_dashboard()``
is one poll iteration, with the sink's own atomic tmp-file + ``os.replace``
idempotence so a browser mid-refresh never sees a torn page.

The dashboard is a *consumer* at the end of the pipeline — it renders a
driver-sized JSON document and touches no Spark state, so there is
nothing here that scales with data volume by construction.
"""

from __future__ import annotations

import html
import json
import os
import tempfile
import time

# Chart palette (validated default): one categorical slot — every chart on
# this page is single-series, so identity is carried by the chart title and
# no legend is rendered.  Values, labels, and table text wear the text
# tokens, never the series color.
_CSS = """
:root {
  color-scheme: light;
  --surface-1: #fcfcfb;
  --surface-2: #f3f3f1;
  --text-primary: #0b0b0b;
  --text-secondary: #52514e;
  --series-1: #2a78d6;
  --grid: #e4e3df;
}
@media (prefers-color-scheme: dark) {
  :root {
    color-scheme: dark;
    --surface-1: #1a1a19;
    --surface-2: #242423;
    --text-primary: #ffffff;
    --text-secondary: #c3c2b7;
    --series-1: #3987e5;
    --grid: #3a3a38;
  }
}
body { background: var(--surface-1); color: var(--text-primary);
       font: 14px/1.45 system-ui, sans-serif; margin: 2rem; }
h1 { font-size: 1.25rem; margin: 0 0 .25rem; }
h2 { font-size: .95rem; color: var(--text-secondary); font-weight: 600;
     margin: 1.5rem 0 .5rem; }
.sub { color: var(--text-secondary); margin-bottom: 1.25rem; }
.tiles { display: flex; flex-wrap: wrap; gap: .75rem; }
.tile { background: var(--surface-2); border-radius: 8px;
        padding: .75rem 1rem; min-width: 9rem; }
.tile .label { color: var(--text-secondary); font-size: .78rem; }
.tile .value { font-size: 1.45rem; font-variant-numeric: tabular-nums; }
.charts { display: flex; flex-wrap: wrap; gap: 1rem; }
.chart { background: var(--surface-2); border-radius: 8px; padding: .75rem 1rem; }
.chart .title { font-size: .82rem; color: var(--text-secondary);
                margin-bottom: .25rem; }
svg .line { stroke: var(--series-1); stroke-width: 2; fill: none;
            stroke-linejoin: round; stroke-linecap: round; }
svg .pt { fill: var(--series-1); }
svg .axis { stroke: var(--grid); stroke-width: 1; }
svg text { fill: var(--text-secondary); font-size: 10px; }
table { border-collapse: collapse; font-variant-numeric: tabular-nums; }
th, td { text-align: right; padding: .3rem .7rem; }
th { color: var(--text-secondary); font-weight: 600;
     border-bottom: 1px solid var(--grid); }
"""


def _fmt(v, pct: bool = False) -> str:
    if v is None:
        return "–"
    # metrics JSON is externally produced: a string-valued metric must not
    # crash the render (f"{v:,}" raises on str) — fall through to str();
    # escaping happens at the render sites (_tile already does; the table
    # loop escapes too), never here, so nothing double-escapes.
    if pct and isinstance(v, (int, float)) and not isinstance(v, bool):
        return f"{100.0 * float(v):.2f}%"
    if isinstance(v, float):
        return f"{v:,.3f}"
    if isinstance(v, int) and not isinstance(v, bool):
        return f"{v:,}"
    return str(v)


def _tile(label: str, value: str) -> str:
    return (
        f'<div class="tile"><div class="label">{html.escape(label)}</div>'
        f'<div class="value">{html.escape(value)}</div></div>'
    )


def _sparkline(
    title: str,
    values: list[float],
    width: int = 360,
    height: int = 110,
    pct: bool = False,
) -> str:
    """Single-series line chart as inline SVG: recessive baseline axis,
    min/max labels on the y extent, native-tooltip hover points (each
    datum carries a ``<title>``, so hover identity needs no scripting)."""
    if not values:
        return (
            f'<div class="chart"><div class="title">{html.escape(title)}</div>'
            f'<div class="sub">waiting for data…</div></div>'
        )
    pad_l, pad_r, pad_t, pad_b = 44, 10, 8, 18
    iw, ih = width - pad_l - pad_r, height - pad_t - pad_b
    lo, hi = min(values), max(values)
    span = (hi - lo) or 1.0
    n = len(values)

    def xy(i: int, v: float) -> tuple[float, float]:
        x = pad_l + (iw * i / max(n - 1, 1))
        y = pad_t + ih * (1.0 - (v - lo) / span)
        return round(x, 1), round(y, 1)

    pts = [xy(i, v) for i, v in enumerate(values)]
    poly = " ".join(f"{x},{y}" for x, y in pts)
    dots = "".join(
        f'<circle class="pt" cx="{x}" cy="{y}" r="4">'
        f"<title>batch {i}: {_fmt(v, pct)}</title></circle>"
        for i, ((x, y), v) in enumerate(zip(pts, values))
    )
    y0 = pad_t + ih
    return (
        f'<div class="chart"><div class="title">{html.escape(title)}</div>'
        f'<svg width="{width}" height="{height}" role="img" '
        f'aria-label="{html.escape(title)}">'
        f'<line class="axis" x1="{pad_l}" y1="{y0}" x2="{width - pad_r}" y2="{y0}"/>'
        f'<text x="{pad_l - 6}" y="{pad_t + 4}" text-anchor="end">{_fmt(hi, pct)}</text>'
        f'<text x="{pad_l - 6}" y="{y0}" text-anchor="end">{_fmt(lo, pct)}</text>'
        f'<polyline class="line" points="{poly}"/>{dots}</svg></div>'
    )


_TABLE_COLS = (
    ("batch_id", "batch", False),
    ("n_rows", "rows", False),
    ("total_events", "events", False),
    ("total_views", "views", False),
    ("conversion_rate", "conversion", True),
    ("rolling_accuracy", "accuracy", True),
    ("mean_predicted_proba", "mean p̂", True),
)


def render_dashboard_html(
    doc: dict, title: str = "Streaming intent dashboard", refresh_sec: int | None = 2
) -> str:
    """Render the metrics document to a complete standalone HTML page.

    ``doc`` is the :class:`MetricsStore` JSON shape:
    ``{"current": {...latest metrics...}, "history": [...]}`` (both keys
    optional — an empty store renders a valid waiting page).
    """
    cur = doc.get("current") or {}
    history = doc.get("history") or []
    last50 = history[-50:]
    ts = cur.get("timestamp")
    updated = (
        time.strftime("%H:%M:%S", time.gmtime(ts)) + " UTC"
        if isinstance(ts, (int, float))
        else "waiting…"
    )
    tiles = "".join(
        [
            _tile("Total views", _fmt(cur.get("total_views"))),
            _tile("Total events", _fmt(cur.get("total_events"))),
            _tile("Conversion rate", _fmt(cur.get("conversion_rate"), pct=True)),
            _tile("Batch", _fmt(cur.get("batch_id"))),
            _tile("Last update", updated),
        ]
    )
    model_tiles = "".join(
        [
            _tile("Rolling accuracy", _fmt(cur.get("rolling_accuracy"), pct=True)),
            _tile("Mean predicted p̂", _fmt(cur.get("mean_predicted_proba"))),
            _tile(
                "Model status",
                "fitted ✓" if cur.get("model_fitted") else "training …",
            ),
        ]
    )
    charts = _sparkline(
        "Conversion rate — last 50 batches",
        [float(h["conversion_rate"]) for h in last50 if "conversion_rate" in h],
        pct=True,
    ) + _sparkline(
        "Rolling accuracy — last 50 batches",
        [
            float(h["rolling_accuracy"])
            for h in last50
            if h.get("rolling_accuracy") is not None
        ],
        pct=True,
    )
    rows = []
    for h in history[-10:][::-1]:
        cells = "".join(
            f"<td>{html.escape(_fmt(h.get(k), pct))}</td>"
            for k, _, pct in _TABLE_COLS
        )
        rows.append(f"<tr>{cells}</tr>")
    head_cells = "".join(f"<th>{html.escape(lbl)}</th>" for _, lbl, _ in _TABLE_COLS)
    table = (
        f"<table><thead><tr>{head_cells}</tr></thead>"
        f'<tbody>{"".join(rows)}</tbody></table>'
        if rows
        else '<div class="sub">no batches yet</div>'
    )
    meta_refresh = (
        f'<meta http-equiv="refresh" content="{int(refresh_sec)}">'
        if refresh_sec
        else ""
    )
    return (
        "<!doctype html><html><head>"
        f'<meta charset="utf-8">{meta_refresh}'
        f"<title>{html.escape(title)}</title><style>{_CSS}</style></head><body>"
        f"<h1>{html.escape(title)}</h1>"
        f'<div class="sub">purchase-intent stream · {len(history)} batches recorded</div>'
        f'<h2>Live metrics</h2><div class="tiles">{tiles}</div>'
        f'<h2>Trends</h2><div class="charts">{charts}</div>'
        f'<h2>Online model</h2><div class="tiles">{model_tiles}</div>'
        f"<h2>Recent batches</h2>{table}"
        "</body></html>"
    )


def write_dashboard(
    metrics_path: str,
    out_path: str,
    title: str = "Streaming intent dashboard",
    refresh_sec: int | None = 2,
) -> str:
    """One poll iteration: read the metrics JSON (missing file → waiting
    page), render, and atomically replace ``out_path``.  Returns the HTML."""
    try:
        with open(metrics_path) as f:
            doc = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        doc = {}
    page = render_dashboard_html(doc, title=title, refresh_sec=refresh_sec)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out_path) or ".")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(page)
        os.replace(tmp, out_path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return page


def watch(
    metrics_path: str,
    out_path: str,
    interval_sec: float = 2.0,
    max_iterations: int | None = None,
) -> int:
    """The polling consumer loop (reference refresh slider default 2 s):
    regenerate the page every ``interval_sec`` until ``max_iterations``
    (None → forever).  Returns the number of renders."""
    n = 0
    while max_iterations is None or n < max_iterations:
        write_dashboard(metrics_path, out_path)
        n += 1
        if max_iterations is not None and n >= max_iterations:
            break
        time.sleep(interval_sec)
    return n
