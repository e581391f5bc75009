"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Generates the ``pages(url, warc_ts, html, text, lang)`` table from
BASELINE.json's input_hint plus a crawl-evidence provenance table —
seeded, no wall-clock, no external data. Shapes mirror the reference's
test corpus properties:

* entity surface forms with controlled collisions — same base name under
  different qualifiers (recasts test_fqn_isolation_in_graph,
  /root/reference/src/graph.rs:1162-1195);
* a few fixed hub entities present in a large fraction of pages (recasts
  hub-file damping, graph.rs:916-918) while the rest of the vocabulary
  SCALES with corpus size (real corpora add entities as they grow — a
  fixed vocabulary would make candidate fan-out quadratic in pages);
* boilerplate nav/footer blocks repeated across pages (recasts NAMESPACE
  pruning, graph.rs:154-199);
* outlinks to other pages (IMPORT analog) and same-host grouping
  (same-package analog, graph.rs:97-101);
* evidence snapshots touching page clusters with timestamps spread over
  two years (temporal-decay analog of commit history, graph.rs:547-581),
  including one "fat" snapshot touching most pages (commit_size_limit
  analog, graph.rs:536-544).

``page_record`` is a pure function of (i, n_pages, seed), so the corpus
generates identically on the driver (small fixtures with exact expected
sets) and distributed via mapInPandas over spark.range (bench scale).
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

QUALIFIERS = ["Sol", "Luna", "Terra"]

FILLER = (
    "the of a to and in on for with from into over under about near "
    "study survey result finding method datum signal noise model trend"
).split()

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _entity(idx: int) -> str:
    """Deterministic entity surface form for a vocabulary index: cycles
    stems, then qualified collisions (Sol.Quasar …), then numbered stems
    (Quasar17 …) — unbounded, collision-rich."""
    n_stems = len(ENTITY_STEMS)
    if idx < n_stems:
        return ENTITY_STEMS[idx]
    idx -= n_stems
    n_qual = len(QUALIFIERS) * n_stems
    if idx < n_qual:
        return f"{QUALIFIERS[idx // n_stems]}.{ENTITY_STEMS[idx % n_stems]}"
    idx -= n_qual
    return f"{ENTITY_STEMS[idx % n_stems]}{idx // n_stems + 2}"


def vocab_size(n_pages: int) -> int:
    # vocabulary grows with the corpus → df per entity stays O(1)
    return max(30, n_pages // 4)


def url_of(i: int) -> str:
    return f"https://{HOSTS[i % len(HOSTS)]}/p/{i:04d}.html"


def page_record(i: int, n_pages: int, seed: int, body_scale: int = 1) -> tuple:
    """Pure: (url, warc_ts, html bytes, text None, lang).

    ``body_scale`` multiplies the body length — scale benches use 8-16 to
    approximate real Common-Crawl page sizes (tens of KB) so extraction
    compute, not per-stage overhead, dominates."""
    url = url_of(i)
    rng2 = random.Random(seed * 100003 + i)
    nv = vocab_size(n_pages)
    title = _entity(rng2.randrange(nv))
    n_body = rng2.randrange(6, 14) * body_scale
    body_entities = [_entity(rng2.randrange(nv)) for _ in range(n_body)]
    for h in ENTITY_STEMS[:3]:  # fixed hub entities
        if rng2.random() < 0.6:
            body_entities.append(h)
    n_links = rng2.randrange(0, 4)
    links = [url_of(rng2.randrange(n_pages)) for _ in range(n_links)]
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
    warc_ts = EPOCH + timedelta(
        days=rng2.randrange(0, 720), seconds=rng2.randrange(86400)
    )
    return (url, warc_ts, html.encode("utf-8"), None, "en",
            title, body_entities, links)


def snap_msg(s: int) -> str:
    """Deterministic snapshot message carrying issue refs — the web analog
    of commit messages with '#123' tags (ref graph.rs:861-863)."""
    return f"crawl batch {s} refs #{s % 37} #{(s * 7 + 3) % 37}"


def evidence_records(n_pages: int, seed: int) -> list[tuple]:
    evidence = []
    n_snap = max(n_pages // 3, 4)
    for s in range(n_snap):
        rng3 = random.Random(seed * 7919 + s)
        snap_id = f"snap-{s:05d}"
        ts = EPOCH + timedelta(days=rng3.randrange(0, 720))
        size = 2 + min(int(rng3.expovariate(0.35)), max(n_pages // 4, 2))
        for i in rng3.sample(range(n_pages), min(size, n_pages)):
            evidence.append((url_of(i), snap_id, ts, snap_msg(s)))
    fat_ts = EPOCH + timedelta(days=400)
    for i in range(int(n_pages * 0.9)):
        evidence.append((url_of(i), "snap-fat", fat_ts, "full recrawl"))
    return evidence


def build_corpus(n_pages: int = 120, seed: int = 7):
    """Driver-side corpus with exact expected mention/triple sets."""
    pages, expected_mentions, expected_triples = [], [], []
    for i in range(n_pages):
        url, warc_ts, html, text, lang, title, body_entities, links = page_record(
            i, n_pages, seed
        )
        pages.append((url, warc_ts, html, text, lang))
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

    expected = {"mentions": expected_mentions, "triples": expected_triples}
    return pages, evidence_records(n_pages, seed), expected


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
EVIDENCE_SCHEMA = "url string, evidence_id string, ts timestamp, msg string"


def pages_df(spark, n_pages: int = 120, seed: int = 7):
    pages, evidence, expected = build_corpus(n_pages, seed)
    pdf = spark.createDataFrame(pages, PAGES_SCHEMA)
    edf = spark.createDataFrame(evidence, EVIDENCE_SCHEMA)
    return pdf, edf, expected


def pages_df_dist(spark, n_pages: int, seed: int = 7, partitions: int | None = None,
                  body_scale: int = 1):
    """Distributed generator: mapInPandas over spark.range — neither the
    corpus nor the evidence ever materializes on the driver (scale path)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [
                page_record(int(i), n_pages, seed, body_scale)[:5]
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    rng = spark.range(n_pages)
    if partitions:
        rng = rng.repartition(partitions)
    pdf = rng.mapInPandas(gen, PAGES_SCHEMA)

    n_snap = max(n_pages // 3, 4)

    def gen_ev(batches):
        for bdf in batches:
            rows = []
            for s in bdf["id"]:
                s = int(s)
                rng3 = random.Random(seed * 7919 + s)
                snap_id = f"snap-{s:05d}"
                ts = EPOCH + timedelta(days=rng3.randrange(0, 720))
                size = 2 + min(int(rng3.expovariate(0.35)), max(n_pages // 4, 2))
                for i in rng3.sample(range(n_pages), min(size, n_pages)):
                    rows.append((url_of(i), snap_id, ts, snap_msg(s)))
            yield pd.DataFrame(rows, columns=["url", "evidence_id", "ts", "msg"])

    ev_rng = spark.range(n_snap)
    if partitions:
        ev_rng = ev_rng.repartition(partitions)
    edf = ev_rng.mapInPandas(gen_ev, EVIDENCE_SCHEMA)
    # the fat snapshot (commit_size_limit analog) touches 90% of pages
    fat = spark.range(int(n_pages * 0.9)).selectExpr(
        f"concat('https://', element_at(array{tuple(HOSTS)}, cast(id % 4 as int) + 1), "
        f"'/p/', format_string('%04d', id), '.html') AS url",
        "'snap-fat' AS evidence_id",
        f"timestamp'{(EPOCH + timedelta(days=400)).strftime('%Y-%m-%d %H:%M:%S')}' AS ts",
        "'full recrawl' AS msg",
    )
    return pdf, edf.unionByName(fat)
