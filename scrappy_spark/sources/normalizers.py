"""Per-API payload normalizers → canonical article dicts.

Pure functions (payload text → list of row dicts matching
ARTICLES_SCHEMA minus date_added); no network, so they are unit-testable
against recorded payloads (tests/payloads/) and safe to run inside
executor tasks under retry.

Field mappings mirror the reference connectors' extraction logic:
IEEE scrappy.py:100-115, Google Scholar :132-143, Semantic Scholar
:183-199, PubMed :227-243, arXiv :262-278 — re-derived from the public
API response shapes, not ported code.

Normalization rules (fixing the reference's mixed-type leaks):
- ``year``: int when parseable, else None (reference emits int or "").
- ``keywords``: always a list (reference: list only from IEEE, else "").
- ``institutions``: always list-of-lists; flat affiliation lists are
  wrapped so SemanticScholar's nested shape is the universal one.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from typing import Any


def _year(v: Any) -> int | None:
    try:
        return int(str(v)[:4])
    except (TypeError, ValueError):
        return None


def _row(
    source: str,
    title: str,
    term: str,
    abstract: str | None = None,
    url: str = "",
    authors: list[str] | None = None,
    institutions: list[list[str]] | None = None,
    keywords: list[str] | None = None,
    year: Any = None,
) -> dict:
    return {
        "source": source,
        "title": title or "",
        "abstract": abstract,
        "url": url or "",
        "authors": authors or [],
        "institutions": [list(g) for g in (institutions or []) if g is not None],
        "keywords": keywords or [],
        "term": term,
        "year": _year(year),
    }


def normalize_ieee(payload: str, term: str) -> list[dict]:
    """IEEE Xplore REST response: articles[].{title,abstract,html_url,
    authors.authors[].full_name, index_terms.ieee_terms.terms,
    publication_year}."""
    data = json.loads(payload)
    rows = []
    for a in data.get("articles", []):
        rows.append(
            _row(
                "IEEE",
                a.get("title", ""),
                term,
                abstract=a.get("abstract"),
                url=a.get("html_url", ""),
                authors=[
                    au.get("full_name", "")
                    for au in a.get("authors", {}).get("authors", [])
                ],
                keywords=list(a.get("index_terms", {}).get("ieee_terms", {}).get("terms", [])),
                year=a.get("publication_year"),
            )
        )
    return rows


def normalize_google_scholar(payload: str, term: str, limit: int = 200) -> list[dict]:
    """SerpAPI Google Scholar: organic_results[].{title,snippet,link},
    truncated to ``limit`` (the reference's [:limit] slice with
    limit=200, scrappy.py:122,131 — matching it keeps row counts
    identical on large result pages)."""
    data = json.loads(payload)
    rows = []
    for r in data.get("organic_results", [])[:limit]:
        rows.append(
            _row(
                "GoogleScholar",
                r.get("title", ""),
                term,
                abstract=r.get("snippet"),
                url=r.get("link", ""),
            )
        )
    return rows


def normalize_semantic_scholar(payload: str, term: str) -> list[dict]:
    """Semantic Scholar graph API: data[].{title,abstract,url,year,
    authors[].{name,affiliations[]}} — nested per-author affiliation
    lists become the canonical institutions list-of-lists."""
    data = json.loads(payload)
    rows = []
    for p in data.get("data", []):
        authors = p.get("authors") or []
        rows.append(
            _row(
                "SemanticScholar",
                p.get("title", ""),
                term,
                abstract=p.get("abstract"),
                url=p.get("url", ""),
                authors=[a.get("name", "") for a in authors],
                institutions=[list(a.get("affiliations") or []) for a in authors],
                year=p.get("year"),
            )
        )
    return rows


def normalize_pubmed(efetch_xml: str, term: str) -> list[dict]:
    """PubMed efetch XML: PubmedArticle/MedlineCitation/Article with
    ArticleTitle, Abstract/AbstractText, AuthorList, AffiliationInfo.
    The reference leaves url empty and year '' for PubMed — we keep the
    empty url but parse the year when PubDate carries one."""
    root = ET.fromstring(efetch_xml)
    rows = []
    for art in root.iter("PubmedArticle"):
        a = art.find(".//Article")
        if a is None:
            continue
        title = "".join((a.findtext("ArticleTitle") or "").split("\n"))
        abstract_parts = [t.text or "" for t in a.findall(".//Abstract/AbstractText")]
        affiliations = [
            aff.text or "" for aff in a.findall(".//AffiliationInfo/Affiliation")
        ]
        authors = []
        for au in a.findall(".//AuthorList/Author"):
            last, fore = au.findtext("LastName"), au.findtext("ForeName")
            if last or fore:
                authors.append(" ".join(x for x in (fore, last) if x))
        rows.append(
            _row(
                "PubMed",
                title,
                term,
                abstract=" ".join(abstract_parts) if abstract_parts else None,
                url="",
                authors=authors,
                institutions=[affiliations] if affiliations else [],
                year=a.findtext(".//JournalIssue/PubDate/Year"),
            )
        )
    return rows


_ATOM = "{http://www.w3.org/2005/Atom}"


def normalize_arxiv(atom_xml: str, term: str) -> list[dict]:
    """arXiv Atom feed: entry.{title,summary,id,author/name,published}."""
    root = ET.fromstring(atom_xml)
    rows = []
    for e in root.findall(f"{_ATOM}entry"):
        rows.append(
            _row(
                "arXiv",
                (e.findtext(f"{_ATOM}title") or "").strip(),
                term,
                abstract=(e.findtext(f"{_ATOM}summary") or "").strip() or None,
                url=e.findtext(f"{_ATOM}id") or "",
                authors=[
                    (a.findtext(f"{_ATOM}name") or "")
                    for a in e.findall(f"{_ATOM}author")
                ],
                year=(e.findtext(f"{_ATOM}published") or "")[:4] or None,
            )
        )
    return rows


NORMALIZERS = {
    "IEEE": normalize_ieee,
    "GoogleScholar": normalize_google_scholar,
    "SemanticScholar": normalize_semantic_scholar,
    "PubMed": normalize_pubmed,
    "arXiv": normalize_arxiv,
}
