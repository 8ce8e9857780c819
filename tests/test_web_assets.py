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
