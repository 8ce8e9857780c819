"""Static sanity checks on the dependency-free web desk (web/).

No JS runtime ships in this image, so these are structural invariants:
balanced delimiters outside strings/comments, and every DOM id the scripts
address must exist in index.html (the class of bug the reference ships at
js/app.js:398, where a renamed key renders gamma as `undefined`).
"""

import re
from pathlib import Path

WEB = Path(__file__).resolve().parent.parent / "web"

# ids created dynamically by buildSliders() in app.js
_SLIDER_KEYS = ["kappa", "theta", "xi", "rho", "v0",
                "lambda_j", "mu_j", "sigma_j"]
DYNAMIC_IDS = {f"{p}-{k}" for p in ("p", "pv") for k in _SLIDER_KEYS}


def _strip(src: str) -> str:
    src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
    src = re.sub(r"//[^\n]*", "", src)
    src = re.sub(r"`(?:[^`\\]|\\.)*`", '""', src, flags=re.S)
    src = re.sub(r'"(?:[^"\\]|\\.)*"', '""', src)
    src = re.sub(r"'(?:[^'\\]|\\.)*'", '""', src)
    return src


def test_js_delimiters_balanced():
    for name in ("app.js", "engine.js"):
        body = _strip((WEB / name).read_text())
        for o, c in [("(", ")"), ("{", "}"), ("[", "]")]:
            assert body.count(o) == body.count(c), (name, o)


def test_app_js_ids_exist_in_index_html():
    src = (WEB / "app.js").read_text()
    html = (WEB / "index.html").read_text()
    wanted = set(re.findall(r'\$\("([\w-]+)"\)', src))
    have = set(re.findall(r'id="([\w-]+)"', html))
    missing = wanted - have - DYNAMIC_IDS
    assert not missing, f"app.js addresses ids missing from index.html: {missing}"


def test_index_html_loads_local_scripts_only():
    html = (WEB / "index.html").read_text()
    srcs = re.findall(r'<script[^>]*src="([^"]+)"', html)
    assert srcs, "expected script tags"
    for s in srcs:
        assert s.startswith("/static/"), f"non-local script {s} (zero-egress rule)"


def test_colors_keys_referenced_exist():
    """Every `COLORS.x` the scripts draw with must exist in the COLORS
    literal — the reference's js/app.js:398 dead-key bug class (a renamed
    key silently renders as `undefined`), applied to the style table."""
    src = (WEB / "app.js").read_text()
    m = re.search(r"const COLORS = \{(.*?)\};", src, flags=re.S)
    assert m, "COLORS literal not found"
    defined = set(re.findall(r"(\w+):", m.group(1)))
    used = set(re.findall(r"COLORS\.(\w+)", src))
    assert used <= defined, f"dead COLORS keys: {used - defined}"


def test_path_renderer_helpers_and_token_discipline():
    """Structural pins over the round-4 animated path renderer: every
    helper it calls is defined in app.js, the cancellation token is
    incremented per run and checked per frame, and the rAF continuation
    is bounded by the step count (no runaway animation loop)."""
    src = (WEB / "app.js").read_text()
    body = re.search(r"function drawPaths\(.*?\n\}\n", src, flags=re.S)
    assert body, "drawPaths not found"
    body = body.group(0)
    for helper in ("frame(", "polyline(", "hline(", "pill(", "fmt("):
        assert helper in body, f"renderer calls undefined helper {helper}"
        name = helper[:-1]
        assert re.search(rf"function {name}\(|const {name} = ", src), (
            f"helper {name} has no definition in app.js")
    assert "++pathAnim" in body, "new run must claim the animation token"
    assert "token !== pathAnim" in body, "frames must check the token"
    assert re.search(r"if \(upto < steps - 1\) requestAnimationFrame",
                     body), "rAF continuation must be step-bounded"
    # the badges partition the shown paths: above + (shown - above)
    assert "shown.length - above" in body


def test_renderer_consumes_live_api_keys():
    """The keys drawPaths' call sites read (`sample_paths`, `strike`)
    must be produced by BOTH data sources — the HTTP API (server.py) and
    the offline fallback engine (engine.js) — so neither path can rot
    into the reference's dead-key rendering bug."""
    app = (WEB / "app.js").read_text()
    eng = (WEB / "engine.js").read_text()
    server = (Path(__file__).resolve().parent.parent
              / "mcos_tpu" / "api" / "server.py").read_text()
    assert re.search(r"drawPaths\(\w+\.sample_paths", app)
    assert '"sample_paths"' in server or "'sample_paths'" in server
    assert "sample_paths" in eng
