"""Generate API-reference pages for mkdocs (mkdocs-gen-files plugin).

The analog of the reference's ``docs/gen_ref_pages.py``: walk the package
and emit one mkdocstrings stub page per module under ``reference/``.

Runs inside ``mkdocs build`` (mkdocs-gen-files provides the virtual file
API); it is import-safe without mkdocs for linting.
"""

from pathlib import Path

try:
    import mkdocs_gen_files
except ImportError:  # pragma: no cover - only present in the docs env
    mkdocs_gen_files = None

PACKAGE = Path(__file__).resolve().parents[2] / "flygym_tpu"


def iter_modules():
    for path in sorted(PACKAGE.rglob("*.py")):
        rel = path.relative_to(PACKAGE.parent)
        parts = list(rel.with_suffix("").parts)
        if parts[-1] == "__init__":
            parts = parts[:-1]
        if any(p.startswith("_") for p in parts):
            continue
        yield ".".join(parts), rel


def main():
    nav = mkdocs_gen_files.Nav()
    for module, rel in iter_modules():
        doc_path = Path("reference", *module.split(".")).with_suffix(".md")
        nav[module.split(".")] = doc_path.relative_to("reference").as_posix()
        with mkdocs_gen_files.open(doc_path, "w") as f:
            f.write(f"# `{module}`\n\n::: {module}\n")
        mkdocs_gen_files.set_edit_path(doc_path, rel)
    with mkdocs_gen_files.open("reference/SUMMARY.md", "w") as f:
        f.writelines(nav.build_literate_nav())


if mkdocs_gen_files is not None:
    main()
elif __name__ == "__main__":
    for module, _ in iter_modules():
        print(module)
