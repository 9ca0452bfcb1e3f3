#!/usr/bin/env python
"""Static documentation site generator (stdlib only).

The reference ships a Sphinx tree (``/root/reference/docs/conf.py``);
this environment has no sphinx/mkdocs, so the docs build is a small
self-contained generator with the same two outputs:

1. **API reference** — one markdown page per public module, generated
   from live docstrings and signatures into ``docs/api/``.
2. **HTML site** — every ``docs/*.md`` (guides + generated API pages)
   rendered to ``docs/_site/*.html`` with a minimal GitHub-flavored
   markdown subset (headers, fenced code, inline code, bold/italic,
   links, lists, tables, paragraphs).

Usage:
    python docs/build_docs.py            # generate api/ + _site/
    python docs/build_docs.py --check    # CI mode: build into a temp
                                         # dir, fail on any error
"""
from __future__ import annotations

import html
import importlib
import inspect
import re
import sys
from pathlib import Path

DOCS = Path(__file__).resolve().parent
REPO = DOCS.parent

API_MODULES = [
    "fingerprints",
    "similarity",
    "clustering",
    "embedMolecules",
    "mmffOptimization",
    "uffOptimization",
    "batchedForcefield",
    "tfd",
    "conformerRmsd",
    "substructure",
    "types",
    "autotune",
]


# ---------------------------------------------------------------- API pages
def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    return inspect.getdoc(obj) or ""


def api_page(modname: str) -> str:
    mod = importlib.import_module(f"nvmolkit_tpu.{modname}")
    lines = [f"# nvmolkit_tpu.{modname}", ""]
    mdoc = _doc(mod)
    if mdoc:
        lines += [mdoc, ""]
    for name in sorted(dir(mod)):
        if name.startswith("_"):
            continue
        obj = getattr(mod, name)
        owner = getattr(obj, "__module__", "")
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if not owner.startswith("nvmolkit_tpu"):
            continue
        if inspect.isfunction(obj):
            lines += [f"## `{name}{_sig(obj)}`", ""]
            d = _doc(obj)
            if d:
                lines += [d, ""]
        else:
            lines += [f"## class `{name}`", ""]
            d = _doc(obj)
            if d:
                lines += [d, ""]
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                lines += [f"### `{name}.{mname}{_sig(meth)}`", ""]
                md = _doc(meth)
                if md:
                    lines += [md, ""]
    return "\n".join(lines)


def build_api(outdir: Path) -> list[Path]:
    outdir.mkdir(parents=True, exist_ok=True)
    pages = []
    index = ["# API reference", ""]
    for m in API_MODULES:
        p = outdir / f"{m}.md"
        p.write_text(api_page(m))
        pages.append(p)
        index.append(f"- [nvmolkit_tpu.{m}]({m}.md)")
    (outdir / "index.md").write_text("\n".join(index) + "\n")
    pages.append(outdir / "index.md")
    return pages


# ------------------------------------------------------------- md -> html
_INLINE = [
    (re.compile(r"`([^`]+)`"), lambda m: f"<code>{html.escape(m.group(1))}</code>"),
    (re.compile(r"\*\*([^*]+)\*\*"), lambda m: f"<strong>{m.group(1)}</strong>"),
    (re.compile(r"\[([^\]]+)\]\(([^)]+)\)"),
     lambda m: f'<a href="{m.group(2).replace(".md", ".html")}">{m.group(1)}</a>'),
]


def _inline(text: str) -> str:
    # escape first, then apply inline markup on the escaped text
    out = html.escape(text, quote=False)
    # un-escape backticked regions handled by the code rule itself
    for rx, sub in _INLINE:
        out = rx.sub(sub, out)
    return out


def md_to_html(md: str, title: str) -> str:
    body: list[str] = []
    lines = md.split("\n")
    i = 0
    in_list = False

    def close_list():
        nonlocal in_list
        if in_list:
            body.append("</ul>")
            in_list = False

    while i < len(lines):
        ln = lines[i]
        if ln.startswith("```"):
            close_list()
            i += 1
            code = []
            while i < len(lines) and not lines[i].startswith("```"):
                code.append(lines[i])
                i += 1
            body.append("<pre><code>" + html.escape("\n".join(code)) + "</code></pre>")
            i += 1
            continue
        if ln.startswith("|") and i + 1 < len(lines) and set(lines[i + 1].replace("|", "").strip()) <= set("-: "):
            close_list()
            hdr = [c.strip() for c in ln.strip("|").split("|")]
            body.append("<table><tr>" + "".join(f"<th>{_inline(c)}</th>" for c in hdr) + "</tr>")
            i += 2
            while i < len(lines) and lines[i].startswith("|"):
                cells = [c.strip() for c in lines[i].strip("|").split("|")]
                body.append("<tr>" + "".join(f"<td>{_inline(c)}</td>" for c in cells) + "</tr>")
                i += 1
            body.append("</table>")
            continue
        m = re.match(r"^(#{1,4}) (.*)$", ln)
        if m:
            close_list()
            n = len(m.group(1))
            body.append(f"<h{n}>{_inline(m.group(2))}</h{n}>")
            i += 1
            continue
        if re.match(r"^[-*] ", ln):
            if not in_list:
                body.append("<ul>")
                in_list = True
            item = [ln[2:]]
            i += 1
            while i < len(lines) and re.match(r"^\s+\S", lines[i]):
                item.append(lines[i].strip())
                i += 1
            body.append(f"<li>{_inline(' '.join(item))}</li>")
            continue
        if not ln.strip():
            close_list()
            i += 1
            continue
        para = [ln]
        i += 1
        while i < len(lines) and lines[i].strip() and not re.match(r"^(#|```|[-*] |\|)", lines[i]):
            para.append(lines[i])
            i += 1
        body.append(f"<p>{_inline(' '.join(para))}</p>")
    close_list()
    css = (
        "body{font-family:sans-serif;max-width:56rem;margin:2rem auto;"
        "padding:0 1rem;line-height:1.55}pre{background:#f6f8fa;padding:1rem;"
        "overflow-x:auto;border-radius:6px}code{background:#f6f8fa;"
        "padding:.1em .3em;border-radius:4px}table{border-collapse:collapse}"
        "td,th{border:1px solid #ccc;padding:.3em .6em;text-align:left}"
    )
    return (
        f"<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title><style>{css}</style></head>"
        f"<body>{''.join(body)}</body></html>"
    )


def build_site(site: Path, api_dir: Path) -> int:
    n = 0
    for md in list(DOCS.glob("*.md")) + list(api_dir.glob("*.md")):
        rel = md.relative_to(DOCS) if md.is_relative_to(DOCS) else Path("api") / md.name
        out = site / rel.with_suffix(".html")
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(md_to_html(md.read_text(), md.stem))
        n += 1
    return n


def main() -> int:
    check = "--check" in sys.argv
    sys.path.insert(0, str(REPO))
    if check:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            api = Path(td) / "api"
            pages = build_api(api)
            n = build_site(Path(td) / "_site", api)
        print(f"docs check OK: {len(pages)} API pages, {n} HTML pages")
        return 0
    api = DOCS / "api"
    pages = build_api(api)
    n = build_site(DOCS / "_site", api)
    print(f"built {len(pages)} API pages -> {api}, {n} HTML pages -> {DOCS / '_site'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
