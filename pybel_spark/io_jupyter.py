"""Inline graph visualization for notebooks (reference
``io/jupyter/inline.py`` + ``constants.py``, re-expressed without Jinja
or a hard IPython dependency).

``to_html`` renders a SELF-CONTAINED HTML document: the node-link JSON
payload plus a small dependency-free SVG force layout (no CDN fetch, so
it works in air-gapped notebook servers — the reference pulls vis.js
from a CDN). ``to_jupyter`` wraps it in an IPython display object when
IPython is importable; ``to_jupyter_str`` returns the raw HTML.

Scale note: inline visualization is a driver-side, small-subgraph
affordance — callers are expected to filter/induce first (the reference
renders the whole in-memory graph; here anything beyond ``max_nodes``
raises instead of freezing the notebook).
"""
import json

#: node function → color (reference io/jupyter/constants.py — the
#: published PyBEL-Jupyter palette)
DEFAULT_COLOR_MAP = {
    'Protein': '#1F77B4',
    'Pathology': '#FF7F0E',
    'BiologicalProcess': '#2CA02C',
    'miRNA': '#D62728',
    'Complex': '#98DF8A',
    'Composite': '#9467BD',
    'Reaction': '#000000',
    'Gene': '#FFBB78',
    'Abundance': '#AEC7E8',
    'RNA': '#FF9896',
}
_FALLBACK_COLOR = '#7F7F7F'

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>pybel-spark graph</title></head>
<body>
<svg id="{el}" width="{width}" height="{height}"
     style="border:1px solid #ddd;font-family:sans-serif"></svg>
<script>
(function() {{
  var data = {payload};
  var W = {width}, H = {height};
  var nodes = data.nodes.map(function(n, i) {{
    return {{i: i, label: n.label, color: n.color,
             x: W/2 + (W/3)*Math.cos(2*Math.PI*i/data.nodes.length),
             y: H/2 + (H/3)*Math.sin(2*Math.PI*i/data.nodes.length),
             vx: 0, vy: 0}};
  }});
  var links = data.links;
  for (var it = 0; it < 150; it++) {{
    for (var a = 0; a < nodes.length; a++)
      for (var b = a + 1; b < nodes.length; b++) {{
        var dx = nodes[b].x-nodes[a].x, dy = nodes[b].y-nodes[a].y;
        var d2 = Math.max(dx*dx+dy*dy, 1), f = 2000/d2;
        var dl = Math.sqrt(d2);
        nodes[a].vx -= f*dx/dl; nodes[a].vy -= f*dy/dl;
        nodes[b].vx += f*dx/dl; nodes[b].vy += f*dy/dl;
      }}
    links.forEach(function(l) {{
      var s = nodes[l.source], t = nodes[l.target];
      var dx = t.x-s.x, dy = t.y-s.y, d = Math.sqrt(dx*dx+dy*dy)||1;
      var f = 0.01*(d-80);
      s.vx += f*dx/d; s.vy += f*dy/d; t.vx -= f*dx/d; t.vy -= f*dy/d;
    }});
    nodes.forEach(function(n) {{
      n.x = Math.min(W-20, Math.max(20, n.x + n.vx*0.4));
      n.y = Math.min(H-20, Math.max(20, n.y + n.vy*0.4));
      n.vx *= 0.6; n.vy *= 0.6;
    }});
  }}
  var svg = document.getElementById("{el}");
  var NS = "http://www.w3.org/2000/svg";
  links.forEach(function(l) {{
    var s = nodes[l.source], t = nodes[l.target];
    var e = document.createElementNS(NS, "line");
    e.setAttribute("x1", s.x); e.setAttribute("y1", s.y);
    e.setAttribute("x2", t.x); e.setAttribute("y2", t.y);
    e.setAttribute("stroke", "#999"); e.setAttribute("stroke-width", "1");
    var title = document.createElementNS(NS, "title");
    title.textContent = l.relation;
    e.appendChild(title); svg.appendChild(e);
  }});
  nodes.forEach(function(n) {{
    var c = document.createElementNS(NS, "circle");
    c.setAttribute("cx", n.x); c.setAttribute("cy", n.y);
    c.setAttribute("r", 7); c.setAttribute("fill", n.color);
    var title = document.createElementNS(NS, "title");
    title.textContent = n.label;
    c.appendChild(title); svg.appendChild(c);
    var t = document.createElementNS(NS, "text");
    t.setAttribute("x", n.x + 9); t.setAttribute("y", n.y + 4);
    t.setAttribute("font-size", "10"); t.textContent = n.label;
    svg.appendChild(t);
  }});
}})();
</script>
</body></html>
"""

DEFAULT_WIDTH = 1000
DEFAULT_HEIGHT = 650


def to_html(nodes, edges, width: int = DEFAULT_WIDTH,
            height: int = DEFAULT_HEIGHT, color_map=None,
            max_nodes: int = 500) -> str:
    """(nodes, edges) DataFrames → self-contained HTML visualization.

    Nodes are colored by BEL function via ``color_map`` (reference
    palette by default) and labeled with their canonical BEL string;
    edge tooltips carry the relation.
    """
    colors = dict(DEFAULT_COLOR_MAP, **(color_map or {}))
    node_rows = nodes.select('node_id', 'node_bel', 'function') \
        .orderBy('node_bel').collect()
    if len(node_rows) > max_nodes:
        raise ValueError(
            '{} nodes > max_nodes={}: induce a subgraph before inline '
            'visualization'.format(len(node_rows), max_nodes))
    index = {r['node_id']: i for i, r in enumerate(node_rows)}
    payload = {
        'nodes': [{'label': r['node_bel'],
                   'color': colors.get(r['function'], _FALLBACK_COLOR)}
                  for r in node_rows],
        'links': [{'source': index[r['source_id']],
                   'target': index[r['target_id']],
                   'relation': r['relation']}
                  for r in edges.select('source_id', 'target_id', 'relation')
                  .collect()
                  if r['source_id'] in index and r['target_id'] in index],
    }
    import uuid

    # '</' must not appear literally inside the <script> block: a node
    # label containing '</script>' (labels come from parsed external
    # documents) would otherwise break out of the script context
    safe_payload = json.dumps(payload).replace('</', '<\\/')
    return _TEMPLATE.format(el='g' + uuid.uuid4().hex[:12],
                            payload=safe_payload,
                            width=width, height=height)


def to_jupyter_str(nodes, edges, **kwargs) -> str:
    """Reference ``to_jupyter_str``: the raw HTML string."""
    return to_html(nodes, edges, **kwargs)


def to_jupyter(nodes, edges, **kwargs):
    """IPython display object (reference ``to_jupyter``); requires
    IPython at call time only."""
    try:
        from IPython.display import HTML
    except ImportError as exc:  # pragma: no cover - env without IPython
        raise ImportError(
            'to_jupyter needs IPython; use to_html for the raw '
            'document') from exc
    return HTML(to_html(nodes, edges, **kwargs))
