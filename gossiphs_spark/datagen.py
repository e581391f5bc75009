"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Generates the ``pages(url, warc_ts, html, text, lang)`` table from
BASELINE.json's input_hint plus a crawl-evidence provenance table —
seeded, no wall-clock, no external data. Shapes mirror the reference's
test corpus properties:

* entity surface forms with controlled collisions — same base name under
  different qualifiers (recasts test_fqn_isolation_in_graph,
  /root/reference/src/graph.rs:1162-1195);
* hub entities present in a large fraction of pages (recasts hub-file
  damping, graph.rs:916-918);
* boilerplate nav/footer blocks repeated across pages (recasts NAMESPACE
  pruning, graph.rs:154-199);
* outlinks to other pages (IMPORT analog) and same-host grouping
  (same-package analog, graph.rs:97-101);
* evidence snapshots touching page groups with timestamps spread over two
  years (temporal-decay analog of commit history, graph.rs:547-581),
  including one "fat" snapshot touching most pages (commit_size_limit
  analog, graph.rs:536-544).

The html is generated bottom-up from the page's entity content, so the
expected mention/triple set is known exactly → golden extraction tests.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

HOSTS = ["alpha.example", "beta.example", "gamma.example", "delta.example"]

ENTITY_STEMS = [
    "Quasar", "Pulsar", "Nebula", "Magnetar", "Blazar", "Parallax",
    "Perihelion", "Syzygy", "Ecliptic", "Albedo", "Bolide", "Coronagraph",
    "Exoplanet", "Heliopause", "Ionosphere", "Kuiper", "Lagrange",
    "Magnetosphere", "Oort", "Photosphere",
]

FILLER = (
    "the of a to and in on for with from into over under about near "
    "study survey result finding method datum signal noise model trend"
).split()

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def build_corpus(n_pages: int = 120, seed: int = 7):
    """Returns (pages_rows, evidence_rows, expected) where expected holds
    the exact mention and triple sets the extractor must emit.

    pages:    (url, warc_ts, html bytes, text, lang)
    evidence: (url, evidence_id, ts)
    """
    rng = random.Random(seed)

    # entity dictionary: plain stems + qualified collisions (Sol.Albedo vs
    # Luna.Albedo share the base name but are distinct canonical entities)
    qualifiers = ["Sol", "Luna", "Terra"]
    entities = list(ENTITY_STEMS)
    for q in qualifiers:
        for s in ENTITY_STEMS[:6]:
            entities.append(f"{q}.{s}")
    hub_entities = ENTITY_STEMS[:3]  # appear on a large fraction of pages

    pages, expected_mentions, expected_triples = [], [], []
    urls = []
    for i in range(n_pages):
        host = HOSTS[i % len(HOSTS)]
        url = f"https://{host}/p/{i:04d}.html"
        urls.append(url)

    for i, url in enumerate(urls):
        rng2 = random.Random(seed * 100003 + i)
        title = entities[rng2.randrange(len(entities))]
        n_body = rng2.randrange(4, 10)
        body_entities = [entities[rng2.randrange(len(entities))] for _ in range(n_body)]
        for h in hub_entities:
            if rng2.random() < 0.6:
                body_entities.append(h)
        n_links = rng2.randrange(0, 4)
        links = [urls[rng2.randrange(len(urls))] for _ in range(n_links)]
        links = [l for l in links if l != url]

        words = []
        for ent in body_entities:
            words.extend(rng2.sample(FILLER, rng2.randrange(2, 5)))
            words.append(ent)
        words.extend(rng2.sample(FILLER, 3))
        body = " ".join(words)

        nav = "<nav>home archive about SiteIndex contact</nav>"
        footer = "<footer>copyright SiteIndex terms privacy</footer>"
        anchors = "".join(f'<a href="{l}">more</a>' for l in links)
        html = (
            f"<html><head><title>{title}</title></head><body>{nav}"
            f"<h1>{title}</h1><p>{body}</p>{anchors}{footer}</body></html>"
        )
        warc_ts = EPOCH + timedelta(days=rng2.randrange(0, 720), seconds=rng2.randrange(86400))
        pages.append((url, warc_ts, html.encode("utf-8"), None, "en"))

        expected_mentions.append((url, title, "DEF"))
        expected_mentions.append((url, title, "REF"))  # the <h1> occurrence
        for ent in body_entities:
            expected_mentions.append((url, ent, "REF"))
        for l in links:
            expected_mentions.append((url, l, "IMPORT"))
        for ent in set(body_entities):
            if ent != title:
                expected_triples.append((title, "mentions", ent, url))
        for l in set(links):
            expected_triples.append((title, "links_to", l, url))

    # evidence snapshots: ~n_pages/3 snapshots, each touching a geometric-ish
    # cluster of pages; one fat snapshot touching 90% of pages
    evidence = []
    n_snap = max(n_pages // 3, 4)
    for s in range(n_snap):
        rng3 = random.Random(seed * 7919 + s)
        snap_id = f"snap-{s:05d}"
        ts = EPOCH + timedelta(days=rng3.randrange(0, 720))
        size = 2 + min(int(rng3.expovariate(0.35)), n_pages // 4)
        for u in rng3.sample(urls, size):
            evidence.append((u, snap_id, ts))
    fat_ts = EPOCH + timedelta(days=400)
    for u in urls[: int(n_pages * 0.9)]:
        evidence.append((u, "snap-fat", fat_ts))

    expected = {
        "mentions": expected_mentions,
        "triples": expected_triples,
    }
    return pages, evidence, expected


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
EVIDENCE_SCHEMA = "url string, evidence_id string, ts timestamp"


def pages_df(spark, n_pages: int = 120, seed: int = 7):
    pages, evidence, expected = build_corpus(n_pages, seed)
    pdf = spark.createDataFrame(pages, PAGES_SCHEMA)
    edf = spark.createDataFrame(evidence, EVIDENCE_SCHEMA)
    return pdf, edf, expected
