"""S1/S2 ingest-utility tests (skip-if-same-size rule, date stamping,
local-path passthrough) — no network: fetches are injected."""

from __future__ import annotations

import os
from datetime import date

from tools.ingest import archival_files, download_file, download_if_new


def _writer(content: bytes):
    def fetch(url: str, dest: str) -> None:
        with open(dest, "wb") as fh:
            fh.write(content)

    return fetch


def test_local_path_passes_through(tmp_path):
    assert download_file("/data/x.gaf", str(tmp_path)) == "/data/x.gaf"


def test_download_date_stamped_and_cached(tmp_path):
    calls = []

    def fetch(url, dest):
        calls.append(url)
        _writer(b"abc")(url, dest)

    d = date(2026, 8, 13)
    p1 = download_file("http://x/goa.gaf.gz", str(tmp_path), fetch, d)
    p2 = download_file("http://x/goa.gaf.gz", str(tmp_path), fetch, d)
    assert p1 == p2 == str(tmp_path / "20260813_goa.gaf.gz")
    assert calls == ["http://x/goa.gaf.gz"]  # second call hits the cache


def test_same_size_older_copies_deleted(tmp_path):
    src = "http://x/goa_uniprot_all.gaf.gz"
    # day 1: 3 bytes; day 2: 4 bytes (changed upstream) — both kept
    download_if_new(src, str(tmp_path), fetch=_writer(b"v1\n"), stamp=date(2026, 8, 11))
    download_if_new(src, str(tmp_path), fetch=_writer(b"v22\n"), stamp=date(2026, 8, 12))
    assert len(archival_files(str(tmp_path), "goa_uniprot_all.gaf.gz")) == 2

    # day 3: same size as day 2 → day-2 copy deleted, day-1 (different
    # size) kept; newest returned
    newest = download_if_new(
        src, str(tmp_path), fetch=_writer(b"v33\n"), stamp=date(2026, 8, 13)
    )
    kept = archival_files(str(tmp_path), "goa_uniprot_all.gaf.gz")
    assert newest == str(tmp_path / "20260813_goa_uniprot_all.gaf.gz")
    assert kept == [
        str(tmp_path / "20260811_goa_uniprot_all.gaf.gz"),
        str(tmp_path / "20260813_goa_uniprot_all.gaf.gz"),
    ]
