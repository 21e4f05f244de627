"""Ingest utility for the S1/S2 rows of SURVEY.md §2.1 — the only two
reference capabilities that live OUTSIDE the query engine (network fetch
is driver-script territory, not a Spark operator).

Reference parity:
- S1 remote fetch (GoNonratAnnotationPipeline.java:327-342,
  ``downloadFile``): ftp/http sources download into a local dir under a
  date-stamped name; local paths pass through unchanged.
- S2 archive dedup (AllSpeciesFileSplitter.java:22-52,
  ``downloadIfNew``): the archive dir keeps dated copies of the file;
  after a new download, every OLDER archival copy whose byte size equals
  the newest one is deleted (same-size ⇒ unchanged upstream snapshot),
  and the newest path is returned.

Spark never sees any of this — the splitter itself (split-by-species
demux) is the S5 operator inside the engine
(go_nonrat_annotation_pipeline_spark/pipeline/gaf.py + __main__.py).
"""

from __future__ import annotations

import os
import shutil
import urllib.request
from datetime import date
from typing import Callable


def _default_fetch(url: str, dest: str) -> None:
    with urllib.request.urlopen(url) as resp, open(dest, "wb") as out:
        shutil.copyfileobj(resp, out)


def date_stamped_name(source: str, stamp: date | None = None) -> str:
    """``<yyyymmdd>_<basename>`` — the FileDownloader prependDateStamp
    convention, so each day's pull archives separately."""
    stamp = stamp or date.today()
    return f"{stamp.strftime('%Y%m%d')}_{os.path.basename(source)}"


def download_file(
    source: str,
    local_dir: str,
    fetch: Callable[[str, str], None] = _default_fetch,
    stamp: date | None = None,
) -> str:
    """S1: fetch a remote file into local_dir under a date-stamped name.

    Non-URL sources are returned unchanged (the reference treats them as
    already-local paths). An existing same-name local file is NOT
    re-fetched (downloadNew semantics: one pull per day per source).
    """
    if not (source.startswith("ftp") or source.startswith("http")):
        return source
    os.makedirs(local_dir, exist_ok=True)
    local = os.path.join(local_dir, date_stamped_name(source, stamp))
    if not os.path.exists(local):
        fetch(source, local)
    return local


def archival_files(archive_dir: str, base_name: str) -> list[str]:
    """Dated archive copies of base_name, sorted ascending (oldest first
    — names lead with yyyymmdd, so lexical order is date order)."""
    os.makedirs(archive_dir, exist_ok=True)
    return sorted(
        os.path.join(archive_dir, f)
        for f in os.listdir(archive_dir)
        if f.endswith(base_name)
        and os.path.isfile(os.path.join(archive_dir, f))
    )


def download_if_new(
    source: str,
    archive_dir: str,
    base_name: str | None = None,
    fetch: Callable[[str, str], None] = _default_fetch,
    stamp: date | None = None,
) -> str:
    """S2: download into the archive, then drop older same-size copies.

    Same size as the newest copy ⇒ the upstream snapshot didn't change,
    so the older file carries no information — delete it. Returns the
    newest archival path.
    """
    base_name = base_name or os.path.basename(source)
    files = archival_files(archive_dir, base_name)
    newest = download_file(source, archive_dir, fetch, stamp)
    if newest not in files:
        files.append(newest)

    newest_len = os.path.getsize(files[-1])
    for older in files[:-1]:
        if os.path.getsize(older) == newest_len:
            os.remove(older)
    return files[-1]
