"""Generate docs/reference/ API pages from the package's own docstrings.

The reference ships ~130 auto-generated API pages (docs/en/reference/** built
by mkdocstrings from source docstrings). This repo is offline-built, so the
equivalent is a deterministic generator: walk every module under
``yolov10_3d_tpu``, pull public classes/functions, signatures, and the
docstrings (which in this codebase double as design notes + reference
citations), and emit one markdown page per module. Re-run after API changes:

    python tools/gen_api_docs.py
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
OUT = ROOT / "docs" / "reference"

SKIP_MODULES = {
    "yolov10_3d_tpu.app",  # gradio demo — import requires the gated package
}


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    d = inspect.getdoc(obj) or ""
    return d.strip()


def _is_local(obj, module) -> bool:
    return getattr(obj, "__module__", None) == module.__name__


def render_module(module) -> str:
    lines = [f"# `{module.__name__}`", ""]
    mdoc = _doc(module)
    if mdoc:
        lines += [mdoc, ""]
    classes = [
        (n, o) for n, o in inspect.getmembers(module, inspect.isclass)
        if _is_local(o, module) and not n.startswith("_")
    ]
    funcs = [
        (n, o) for n, o in inspect.getmembers(module, inspect.isfunction)
        if _is_local(o, module) and not n.startswith("_")
    ]
    for name, cls in classes:
        lines += [f"## class `{name}{_sig(cls)}`", ""]
        cdoc = _doc(cls)
        if cdoc:
            lines += [cdoc, ""]
        for mname, meth in inspect.getmembers(cls, inspect.isfunction):
            if mname.startswith("_") and mname != "__call__":
                continue
            if meth.__qualname__.split(".")[0] != name:
                continue  # inherited
            lines += [f"### `{name}.{mname}{_sig(meth)}`", ""]
            d = _doc(meth)
            if d:
                lines += [d, ""]
    for name, fn in funcs:
        lines += [f"## `{name}{_sig(fn)}`", ""]
        d = _doc(fn)
        if d:
            lines += [d, ""]
    if not classes and not funcs:
        lines += ["*(constants / data module — no public classes or functions)*", ""]
    return "\n".join(lines)


def main(out: Path = OUT) -> int:
    import yolov10_3d_tpu as pkg

    OUT = Path(out)
    OUT.mkdir(parents=True, exist_ok=True)
    pages = []
    for info in sorted(
        pkgutil.walk_packages(pkg.__path__, prefix="yolov10_3d_tpu."),
        key=lambda i: i.name,
    ):
        if info.ispkg or info.name in SKIP_MODULES:
            continue
        try:
            mod = importlib.import_module(info.name)
        except Exception as e:  # gated optional deps
            print(f"skip {info.name}: {type(e).__name__}: {e}")
            continue
        rel = info.name[len("yolov10_3d_tpu."):]
        page = OUT / (rel.replace(".", "/") + ".md")
        page.parent.mkdir(parents=True, exist_ok=True)
        page.write_text(render_module(mod) + "\n")
        pages.append((info.name, page.relative_to(OUT)))
        print(f"wrote {page}")

    index = ["# API reference", "",
             "Generated from source docstrings by `tools/gen_api_docs.py` "
             "(the offline analogue of the reference's mkdocstrings pages).", ""]
    cur = None
    for name, rel in pages:
        top = name.split(".")[1]
        if top != cur:
            index += [f"## `{top}/`", ""]
            cur = top
        index += [f"- [`{name}`]({rel})"]
    (OUT / "index.md").write_text("\n".join(index) + "\n")
    print(f"{len(pages)} module pages + index")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(Path(sys.argv[1]) if len(sys.argv) > 1 else OUT))
