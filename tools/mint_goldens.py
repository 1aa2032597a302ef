"""Mint 10-K / 10-Q / obsolete-8-K goldens by running the REFERENCE
extractor (/root/reference/extract_items.py) in-process over the
synthetic plain-text corpus (edgar_crawler_spark.fixtures.filing_corpus).

The reference's HTML path needs bs4 + cssutils (absent here), but the
plain-text path never touches them beyond a trivial ``find('td')``
sniff — so we import the genuine reference source with minimal stub
modules installed and drive only txt documents through it. The minted
goldens (tests/fixtures/minted_goldens/*.json) are committed; the
parity test (tests/test_minted_goldens.py) replays OUR kernel against
them byte-exactly.

Usage: python tools/mint_goldens.py
"""

from __future__ import annotations

import importlib.util
import json
import logging
import os
import re
import sys
import tempfile
import types

sys.path.insert(0, ".")

REF = "/root/reference"
OUT_DIR = "tests/fixtures/minted_goldens"


def _install_stubs(tmp: str) -> None:
    # click: only `cli = click.Group()` runs at import
    click = types.ModuleType("click")

    class _Group:
        def command(self, *a, **k):
            return lambda f: f

    click.Group = _Group
    click.option = lambda *a, **k: (lambda f: f)
    click.command = lambda *a, **k: (lambda f: f)
    sys.modules["click"] = click

    # cssutils: import-time `cssutils.log.setLevel(...)` only (the
    # parser is inside the is_html branch we never enter)
    cssutils = types.ModuleType("cssutils")
    cssutils.log = logging.getLogger("stub-cssutils")
    sys.modules["cssutils"] = cssutils

    # bs4: used on the txt path only as `BeautifulSoup(doc).find(tag)`
    # for the <td>/<tr> HTML sniff — our corpus contains neither, and
    # this stub faithfully reports tag absence via regex
    bs4 = types.ModuleType("bs4")

    class _Soup:
        def __init__(self, markup, *a, **k):
            self._text = str(markup)

        def find(self, tag):
            m = re.search(rf"<{tag}[\s>]", self._text, re.IGNORECASE)
            return m  # truthy when present, None when absent

    bs4.BeautifulSoup = _Soup
    sys.modules["bs4"] = bs4

    # pathos / tqdm: imported, unused by the API we call
    pathos = types.ModuleType("pathos")
    pools = types.ModuleType("pathos.pools")
    pools.ProcessPool = object
    pathos.pools = pools
    sys.modules["pathos"] = pathos
    sys.modules["pathos.pools"] = pools
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda x, *a, **k: x
    sys.modules["tqdm"] = tqdm_mod

    # the reference package context: __init__ (mkdirs under the
    # read-only snapshot — redirect to tmp) and logger
    ref_init = types.ModuleType("__init__")
    ref_init.DATASET_DIR = os.path.join(tmp, "datasets")
    ref_init.LOGGING_DIR = os.path.join(tmp, "logs")
    os.makedirs(ref_init.DATASET_DIR, exist_ok=True)
    os.makedirs(ref_init.LOGGING_DIR, exist_ok=True)
    sys.modules["__init__"] = ref_init

    logger_mod = types.ModuleType("logger")

    class _Logger:
        def __init__(self, *a, **k):
            pass

        def get_logger(self):
            lg = logging.getLogger("stub-ref")
            lg.addHandler(logging.NullHandler())
            lg.propagate = False
            return lg

    logger_mod.Logger = _Logger
    sys.modules["logger"] = logger_mod


def _load_reference(tmp: str):
    _install_stubs(tmp)
    sys.path.insert(0, REF)
    spec = importlib.util.spec_from_file_location(
        "ref_extract_items", os.path.join(REF, "extract_items.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    from edgar_crawler_spark.fixtures.filing_corpus import CORPUS_SIZES, full_corpus

    tmp = tempfile.mkdtemp(prefix="mint_")
    ref = _load_reference(tmp)

    raw_root = os.path.join(tmp, "RAW")
    out_root = os.path.join(tmp, "OUT")
    goldens: dict[str, dict] = {form: {} for form in CORPUS_SIZES}
    n_null = 0
    for entry in full_corpus():
        meta = entry["metadata"]
        form, fname = entry["form"], meta["filename"]
        raw_dir = os.path.join(raw_root, meta["Type"])
        os.makedirs(raw_dir, exist_ok=True)
        with open(os.path.join(raw_dir, fname), "w") as f:
            f.write(entry["content"])

        ex = ref.ExtractItems(
            remove_tables=entry["remove_tables"],
            items_to_extract=None,
            include_signature=entry["include_signature"],
            raw_files_folder=raw_root,
            extracted_files_folder=out_root,
            skip_extracted_filings=False,
        )
        ex.determine_items_to_extract(meta)
        record = ex.extract_items(meta)
        if record is None:
            n_null += 1
        goldens[form][fname] = record

    os.makedirs(OUT_DIR, exist_ok=True)
    for form, recs in goldens.items():
        path = os.path.join(OUT_DIR, f"{form}.json")
        with open(path, "w") as f:
            json.dump(recs, f, indent=1, ensure_ascii=False, sort_keys=True)
        print(f"minted {len(recs):3d} goldens -> {path}")
    print(f"null records (all items empty): {n_null}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
