"""URL canonicalization — the pass-1 blocking key of the ER pipeline.

Direct ancestor in the reference: the git-URL parser that splits a repo URL
into (domain, group, repo) (``jenkins_scripts/monitor/monitor_git_filechanges.sh:80-99``,
SURVEY.md §2.2 M16). Pure string functions; no network.
"""

from __future__ import annotations

from urllib.parse import urlsplit


def canonical_host(url: str) -> str:
    """Lowercased registered host with a leading ``www.`` stripped.

    This is the cheap high-recall blocking key (SURVEY.md §7.3): pages on
    the same site land in one block. Port and credentials are dropped.
    """
    try:
        host = urlsplit(url).hostname or ""
    except ValueError:
        host = ""
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    return host


def canonical_url(url: str) -> str:
    """Scheme-and-fragment-insensitive canonical form: host + path with
    trailing slash stripped, query kept (it distinguishes pages)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    path = parts.path.rstrip("/") or "/"
    q = f"?{parts.query}" if parts.query else ""
    return f"{canonical_host(url)}{path}{q}"


def url_path(url: str) -> str:
    try:
        return urlsplit(url).path or "/"
    except ValueError:
        return "/"
