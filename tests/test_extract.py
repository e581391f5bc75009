"""Golden tests for the html extraction kernel (U1), recasting the
reference's per-language extractor tests (/root/reference/src/extractor.rs:
310-727): fixed input → exact expected (name, kind) set, byte-identical
extracted text, and determinism across call sites."""

from __future__ import annotations

import pytest

from gossiphs_spark.operators.extract import extract_page, extract_text

HTML = (
    b"<html><head><title>Quasar</title></head><body>"
    b"<nav>home archive SiteIndex</nav>"
    b"<h1>Quasar</h1><p>the Pulsar signal near Sol.Albedo was weak</p>"
    b'<a href="https://beta.example/p/0002.html">more</a>'
    b"<footer>copyright SiteIndex</footer></body></html>"
)


@pytest.mark.smoke
def test_exact_symbol_set():
    rows = extract_page("u1", HTML)
    got = {(r[1], r[2]) for r in rows}
    assert got == {
        ("Quasar", "DEF"),
        ("Quasar", "REF"),            # the h1 occurrence in the body
        ("Pulsar", "REF"),
        ("Sol.Albedo", "REF"),
        ("https://beta.example/p/0002.html", "IMPORT"),
        ("nav", "NAMESPACE"),
        ("footer", "NAMESPACE"),
    }


def test_boilerplate_entities_excluded():
    # SiteIndex appears only inside nav/footer → must not become a REF
    rows = extract_page("u1", HTML)
    names = {r[1] for r in rows if r[2] == "REF"}
    assert "SiteIndex" not in names


def test_offsets_are_identity_anchors():
    rows = extract_page("u1", HTML)
    s = HTML.decode()
    for r in rows:
        _, name, kind, a, b, *_ = r
        if kind in ("DEF", "REF", "IMPORT"):
            assert s[a:b] == name, (name, kind, s[a:b])


def test_extract_text_deterministic_and_stripped():
    t1 = extract_text(HTML)
    t2 = extract_text(bytes(HTML))
    assert t1 == t2  # byte-identical per url
    assert "SiteIndex" not in t1          # nav/footer stripped
    assert "Pulsar" in t1
    assert "<" not in t1 and ">" not in t1


def test_non_utf8_skipped():
    assert extract_text(b"\xff\xfe<bad>") is None
    assert extract_page("u", b"\xff\xfe<bad>") == []


def test_empty_and_malformed():
    assert extract_page("u", b"") == []
    rows = extract_page("u", b"<html><body>Pulsar <a href=>x</a></body></html>")
    assert ("Pulsar", "REF") in {(r[1], r[2]) for r in rows}


# ---------------------------------------------------------------------------
# Markdown profile + F1 extension dispatch (ref rule.rs:42-252 dispatch seam)
# ---------------------------------------------------------------------------
MD_GOLDEN = b"""# Orbital Survey
Results from Magnetar and Sol.Quasar observations.
```
code Fenced NotARef
```
See [the archive](https://example.org/archive.md) and [raw](./raw.html).
Final Albedo notes.
"""


@pytest.mark.smoke
def test_md_profile_golden():
    from gossiphs_spark.operators.extract import extract_page_md

    rows = extract_page_md("doc://1/index.md", MD_GOLDEN)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r[2], []).append(r)
    assert [r[1] for r in by_kind["DEF"]] == ["Orbital Survey"]
    assert sorted(r[1] for r in by_kind["IMPORT"]) == [
        "./raw.html", "https://example.org/archive.md",
    ]
    ref_names = sorted(r[1] for r in by_kind["REF"])
    # fenced block + heading + link spans excluded; dotted names qualified
    assert ref_names == ["Albedo", "Final", "Magnetar", "Results", "See", "Sol.Quasar"]
    assert [r[1] for r in by_kind["NAMESPACE"]] == ["code"]
    # offsets anchor the source bytes exactly
    for r in rows:
        if r[2] in ("DEF", "REF"):
            s = MD_GOLDEN.decode()
            assert s[r[3]:r[4]] == r[1]


def test_md_profile_dispatches_by_extension(spark):
    from gossiphs_spark.operators.extract import extract_mentions

    pages = spark.createDataFrame(
        [
            ("doc://1/index.md", b"# Title\nMagnetar here"),
            ("https://h/p.html",
             b"<html><head><title>Other</title></head><body><p>Magnetar</p></body></html>"),
        ],
        "url string, html binary",
    )
    rows = extract_mentions(pages, columns=("url", "name", "kind", "start_byte")).collect()
    defs = {r["url"]: r["name"] for r in rows if r["kind"] == "DEF"}
    assert defs == {"doc://1/index.md": "Title", "https://h/p.html": "Other"}


def test_md_profile_deterministic():
    from gossiphs_spark.operators.extract import extract_page_md

    assert extract_page_md("u.md", MD_GOLDEN) == extract_page_md("u.md", MD_GOLDEN)


TXT_GOLDEN = (
    b"\n  Survey Notes  \n"
    b"the Magnetar reading near Sol.Quasar was strong,\n"
    b"archived at https://example.org/archive.txt. Final batch follows\n"
)


def test_txt_profile_golden():
    from gossiphs_spark.operators.extract import extract_page_txt

    rows = extract_page_txt("doc://7/notes", TXT_GOLDEN)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r[2], []).append(r)
    # first non-empty line, whitespace-stripped, is the page entity
    assert [r[1] for r in by_kind["DEF"]] == ["Survey Notes"]
    # bare url captured, trailing punctuation trimmed (F12 analog)
    assert [r[1] for r in by_kind["IMPORT"]] == ["https://example.org/archive.txt"]
    ref_names = sorted(r[1] for r in by_kind["REF"])
    # title-line and url spans excluded from the entity scan
    assert ref_names == ["Final", "Magnetar", "Sol.Quasar"]
    s = TXT_GOLDEN.decode()
    for r in rows:
        assert s[r[3]:r[4]] == r[1]  # offsets anchor source bytes exactly
    assert extract_page_txt("u", TXT_GOLDEN) == extract_page_txt("u", TXT_GOLDEN)


def test_profile_dispatch_three_grammars():
    """Extension picks md/txt/html; query strings and fragments are
    stripped; extensionless urls sniff the content (leading '<' → html,
    anything else → plain text)."""
    from gossiphs_spark.operators.extract import (
        extract_page, extract_page_md, extract_page_txt, profile_of,
    )

    assert profile_of("a/b.md") is extract_page_md
    assert profile_of("a/b.md?v=2") is extract_page_md
    assert profile_of("a/b.txt#frag") is extract_page_txt
    assert profile_of("a/b.html") is extract_page
    assert profile_of("a/b.xyz") is extract_page  # unknown ext → default
    # extensionless: content sniff
    assert profile_of("https://h/page", b"<html><body>x</body></html>") is extract_page
    assert profile_of("https://h/page", b"  <!doctype html>") is extract_page
    assert profile_of("https://h/page", TXT_GOLDEN) is extract_page_txt
    # extensionless without a blob keeps the historical html default
    assert profile_of("https://h/page") is extract_page


JSON_GOLDEN = (
    b'{"title": "Quasar Atlas", "body": "the Magnetar near Sol.Quasar flared",'
    b' "link": "https://example.org/atlas.json", "count": 42,'
    b' "meta": {"name": "ignored Second", "tags": "Final"}}'
)


def test_json_profile_golden():
    from gossiphs_spark.operators.extract import extract_page_json

    rows = extract_page_json("doc://9/data.json", JSON_GOLDEN)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r[2], []).append(r)
    # first title|name|@id pair is the entity; the nested "name" later
    # does NOT produce a second DEF
    assert [r[1] for r in by_kind["DEF"]] == ["Quasar Atlas"]
    assert [r[1] for r in by_kind["IMPORT"]] == ["https://example.org/atlas.json"]
    # keys are structural NAMESPACE mentions, never REFs
    assert sorted(r[1] for r in by_kind["NAMESPACE"]) == [
        "body", "count", "link", "meta", "name", "tags", "title"
    ]
    # capitalized tokens inside non-DEF/IMPORT string VALUES only
    assert sorted(r[1] for r in by_kind["REF"]) == [
        "Final", "Magnetar", "Second", "Sol.Quasar"
    ]
    s = JSON_GOLDEN.decode()
    for r in rows:
        assert s[r[3]:r[4]] == r[1]  # offsets anchor source bytes exactly
    assert extract_page_json("u", JSON_GOLDEN) == extract_page_json("u", JSON_GOLDEN)


def test_json_profile_dispatch_and_sniff():
    from gossiphs_spark.operators.extract import extract_page_json, profile_of

    assert profile_of("a/b.json") is extract_page_json
    assert profile_of("a/b.jsonld?v=1") is extract_page_json
    assert profile_of("https://h/api", JSON_GOLDEN) is extract_page_json
    assert profile_of("https://h/api", b'  [1, 2, 3]') is extract_page_json
    # malformed JSON must not throw — regex scan degrades gracefully
    assert extract_page_json("u", b'{"title": "Ok", broken') == [
        r for r in extract_page_json("u", b'{"title": "Ok", broken')
    ]


XML_GOLDEN = (
    b'<?xml version="1.0"?>\n'
    b'<rss version="2.0"><channel>\n'
    b'<title>Quasar Atlas</title>\n'
    b'<link>https://example.org/feed.xml</link>\n'
    b'<description>the Magnetar near Sol.Quasar flared</description>\n'
    b'<atom:link href="https://example.org/self.xml"/>\n'
    b'<item><description>Final batch</description></item>\n'
    b'</channel></rss>\n'
)


def test_xml_profile_golden():
    from gossiphs_spark.operators.extract import extract_page_xml

    rows = extract_page_xml("doc://11/feed.xml", XML_GOLDEN)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r[2], []).append(r)
    # first <title> is the channel entity
    assert [r[1] for r in by_kind["DEF"]] == ["Quasar Atlas"]
    # <link> element text AND href attributes both resolve to IMPORTs
    assert sorted(r[1] for r in by_kind["IMPORT"]) == [
        "https://example.org/feed.xml", "https://example.org/self.xml"
    ]
    # element tag names are structural NAMESPACE mentions (closing tags
    # and the <?xml declaration excluded)
    assert sorted(r[1] for r in by_kind["NAMESPACE"]) == [
        "atom:link", "channel", "description", "description",
        "item", "link", "rss", "title",
    ]
    # capitalized tokens in text content only — never attribute values
    assert sorted(r[1] for r in by_kind["REF"]) == [
        "Final", "Magnetar", "Sol.Quasar"
    ]
    s = XML_GOLDEN.decode()
    for r in rows:
        assert s[r[3]:r[4]] == r[1]  # offsets anchor source bytes exactly
    assert extract_page_xml("u", XML_GOLDEN) == extract_page_xml("u", XML_GOLDEN)


def test_xml_profile_dispatch_and_sniff():
    from gossiphs_spark.operators.extract import extract_page_xml, profile_of

    assert profile_of("a/b.xml") is extract_page_xml
    assert profile_of("a/feed.rss?v=1") is extract_page_xml
    assert profile_of("a/feed.atom") is extract_page_xml
    # extensionless: xml declaration / rss / feed roots sniff to xml
    assert profile_of("https://h/feed", XML_GOLDEN) is extract_page_xml
    assert profile_of("https://h/feed", b"<rss><channel/></rss>") is extract_page_xml
    assert profile_of("https://h/feed", b'<feed xmlns="x"/>') is extract_page_xml
    # malformed XML must not throw — regex scan degrades gracefully
    assert extract_page_xml("u", b"<rss><title>Ok</titl") == [
        r for r in extract_page_xml("u", b"<rss><title>Ok</titl")
    ]


def test_xml_selfclosing_link_does_not_swallow_markup():
    """Regression: a self-closing/unclosed <link> followed by a later real
    <link> element must not merge into one garbage IMPORT spanning markup,
    and must not suppress the REF tokens in between."""
    from gossiphs_spark.operators.extract import extract_page_xml

    feed = b'<rss><link href="https://a.example/self"/>mid Text<link>https://b.example/x</link></rss>'
    rows = extract_page_xml("u.xml", feed)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r[2], []).append(r[1])
    assert sorted(by_kind["IMPORT"]) == [
        "https://a.example/self", "https://b.example/x"
    ]
    assert by_kind["REF"] == ["Text"]
    assert all("<" not in n for n in by_kind["IMPORT"])


CSV_GOLDEN = (
    b"name,description,homepage\n"
    b"Magnetar Prime, the brightest Magnetar on record ,https://example.org/m1.\n"
    b"quiet row,no caps here,https://example.org/m2\n"
)


def test_csv_profile_golden():
    from gossiphs_spark.operators.extract import extract_page_csv

    rows = extract_page_csv("doc://13/table.csv", CSV_GOLDEN)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r[2], []).append(r[1])
    # header cells are structural column names
    assert by_kind["NAMESPACE"] == ["name", "description", "homepage"]
    # first cell of the first data row is the table's lead entity
    assert by_kind["DEF"] == ["Magnetar Prime"]
    # url cells → IMPORT, trailing punctuation trimmed (F12 analog)
    assert sorted(by_kind["IMPORT"]) == [
        "https://example.org/m1", "https://example.org/m2"
    ]
    # capitalized tokens in OTHER data cells only (not the DEF cell)
    assert by_kind["REF"] == ["Magnetar"]
    s = CSV_GOLDEN.decode()
    for r in rows:
        assert s[r[3]:r[4]] == r[1]  # offsets anchor source bytes exactly
    assert extract_page_csv("u", CSV_GOLDEN) == extract_page_csv("u", CSV_GOLDEN)


def test_csv_profile_tsv_and_dispatch():
    from gossiphs_spark.operators.extract import extract_page_csv, profile_of

    assert profile_of("a/b.csv") is extract_page_csv
    assert profile_of("a/b.tsv?v=1") is extract_page_csv
    tsv = b"col_a\tcol_b\nLead Entity\tsome Cap text\n"
    rows = extract_page_csv("u.tsv", tsv)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r[2], []).append(r[1])
    assert by_kind["NAMESPACE"] == ["col_a", "col_b"]
    assert by_kind["DEF"] == ["Lead Entity"]
    assert by_kind["REF"] == ["Cap"]
    # degenerate inputs must not throw; a header-only table yields ONLY
    # its structural namespace cell (no DEF without a data row)
    assert extract_page_csv("u", b"") == []
    header_only = extract_page_csv("u", b"justoneheader\n")
    assert [(r[1], r[2]) for r in header_only] == [("justoneheader", "NAMESPACE")]


def test_profile_counts_mixed_fixture(spark):
    """Dispatch visibility (VERDICT r4 item 6, ref graph.rs:117-146): the
    per-profile page counters must tally every grammar the dispatch can
    select, with sniffed selections kept distinct — an unknown format
    flooding the text grammar is a visible sniff:text spike."""
    from gossiphs_spark.operators.extract import profile_counts

    rows = [
        ("http://a/p1.html", b"<html><p>X</p></html>"),
        ("http://a/p2.htm", b"<html><p>X</p></html>"),   # unknown ext → html
        ("http://a/n.md", b"# T"),
        ("http://a/n2.markdown", b"# T"),
        ("http://a/d.json", b"{}"),
        ("http://a/f.rss", b"<rss/>"),
        ("http://a/t.csv", b"a,b"),
        ("http://a/t2.tsv", b"a\tb"),
        ("http://a/plain.txt", b"words"),
        # extensionless → content sniff
        ("http://a/page", b"<html><p>X</p></html>"),
        ("http://a/feed", b"<?xml version='1.0'?><rss/>"),
        ("http://a/api", b'{"k": 1}'),
        ("http://a/blob", b"\x00\x01binaryish"),
        ("http://a/readme", b"just words"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r["profile"]: r["n_pages"] for r in profile_counts(pages).collect()}
    assert got == {
        "html": 2, "md": 2, "json": 1, "xml": 1, "csv": 2, "text": 1,
        "sniff:html": 1, "sniff:xml": 1, "sniff:json": 1, "sniff:text": 2,
    }
    # counters and dispatch share one selector: totals must cover all pages
    assert sum(got.values()) == len(rows)


def test_yaml_profile_golden():
    """Seventh grammar (F1 dispatch breadth, ref rule.rs:42-252): YAML —
    top-level keys NAMESPACE, first title:/name: DEF, url values IMPORT
    (quote + trailing-punct trim), entities in other values REF; nested
    list items contribute values only. Offsets are byte-exact."""
    from gossiphs_spark.operators.extract import extract_page_yaml

    y = (b"---\n"
         b"title: Doc7\n"
         b"tags:\n"
         b"  - Pulsar signal\n"
         b"  - quiet\n"
         b"body: the Quasar flared near Sol.Albedo today\n"
         b'link: "https://ex.com/8"\n')
    rows = extract_page_yaml("u://x.yaml", y)
    got = {(r[1], r[2], r[3], r[4]) for r in rows}
    assert got == {
        ("title", "NAMESPACE", 4, 9),
        ("Doc7", "DEF", 11, 15),
        ("tags", "NAMESPACE", 16, 20),
        ("Pulsar", "REF", 26, 32),
        ("body", "NAMESPACE", 50, 54),
        ("Quasar", "REF", 60, 66),
        ("Sol.Albedo", "REF", 79, 89),
        ("link", "NAMESPACE", 96, 100),
        ("https://ex.com/8", "IMPORT", 103, 119),
    }
    # byte-offset identity: every (start, end) slices the name out of the blob
    s = y.decode()
    for _, name, kind, a, b, *_ in rows:
        assert s[a:b] == name, (name, kind)
    # only the FIRST title/name wins DEF; later ones scan as values
    rows2 = extract_page_yaml("u", b"name: Alpha\ntitle: Beta\n")
    kinds = [(r[1], r[2]) for r in rows2]
    assert ("Alpha", "DEF") in kinds and ("Beta", "REF") in kinds
    # non-utf8 declines
    assert extract_page_yaml("u", b"\xff\xfe\x00") == []


def test_ini_profile_golden():
    """Eighth grammar: INI/TOML — [section] headers NAMESPACE (dotted
    tables too), comments skipped, key=value routed like YAML."""
    from gossiphs_spark.operators.extract import extract_page_ini

    i = (b"; a comment\n"
         b"[site.meta]\n"
         b"title = Doc9\n"
         b"body = saw the Magnetar again\n"
         b"link = https://ex.com/10.\n")
    rows = extract_page_ini("u://x.ini", i)
    got = {(r[1], r[2], r[3], r[4]) for r in rows}
    assert got == {
        ("site.meta", "NAMESPACE", 13, 22),
        ("Doc9", "DEF", 32, 36),
        ("Magnetar", "REF", 52, 60),
        ("https://ex.com/10", "IMPORT", 74, 91),  # trailing '.' trimmed
    }
    s = i.decode()
    for _, name, kind, a, b, *_ in rows:
        assert s[a:b] == name or (kind == "IMPORT" and s[a:b + 1].startswith(name))
    # '#' comment lines (TOML style) skipped too
    rows2 = extract_page_ini("u", b"# top\nkey = Nebula # Trailing note\n")
    assert ("Nebula", "REF") in {(r[1], r[2]) for r in rows2}


def test_inline_comments_and_block_scalars():
    """r5 ADVICE: comment prose and block-scalar literal content must not
    emit mentions; markers inside quoted spans stay literal."""
    from gossiphs_spark.operators.extract import (
        extract_page_ini, extract_page_yaml,
    )

    # INI: ' ; note' and ' # note' comments stripped before routing —
    # neither Ursa nor the commented-out url may surface
    rows = extract_page_ini(
        "u", b"key = Vega ; saw Ursa too\nurl = real ; https://bad.example\n")
    names = {(r[1], r[2]) for r in rows}
    assert ("Vega", "REF") in names
    assert not any(n[0] == "Ursa" or "bad.example" in n[0] for n in names)
    # quote-guarded: a '#' inside a quoted TOML string is literal
    rows = extract_page_ini("u", b'title = "Alpha # Beta" # Gamma note\n')
    names = {(r[1], r[2]) for r in rows}
    assert ("Alpha # Beta", "DEF") in names
    assert not any("Gamma" in n[0] for n in names)
    # YAML inline ' # note' comments: stripped, including whole-comment
    # values (key: # note emits nothing for the value)
    rows = extract_page_yaml(
        "u", b"body: Lyra rising # but Draco is comment\nnote: # Orion only\n")
    names = {(r[1], r[2]) for r in rows}
    assert ("Lyra", "REF") in names
    assert not any(n[0] in ("Draco", "Orion") for n in names)
    # YAML block scalars: indented content under | or > is literal text,
    # not keys/values — 'fake_key' and 'Cygnus' must not emit; the next
    # top-level key after the block resumes normal scanning
    y = (b"title: Doc1\n"
         b"script: |\n"
         b"  fake_key: Cygnus value\n"
         b"  more literal text\n"
         b"after: saw Phoenix land\n")
    rows = extract_page_yaml("u", y)
    names = {(r[1], r[2]) for r in rows}
    assert ("Doc1", "DEF") in names and ("Phoenix", "REF") in names
    assert ("after", "NAMESPACE") in names
    assert not any(n[0] in ("fake_key", "Cygnus") for n in names)
    # folded introducer with chomping indicator + trailing comment
    y2 = b"out: >-  # folded\n  Aquila text here\nnext: Carina\n"
    names2 = {(r[1], r[2]) for r in extract_page_yaml("u", y2)}
    assert ("Carina", "REF") in names2
    assert not any(n[0] == "Aquila" for n in names2)
    # byte-exactness survives comment stripping (quote + inner padding)
    rows = extract_page_ini("u", b'name = " Sirius "  ; pad\n')
    s = 'name = " Sirius "  ; pad\n'
    for _, name, kind, a, b, *_ in rows:
        assert s[a:b] == name


def test_yaml_block_intro_grammar_boundary():
    """The block-scalar header grammar, probed at its exact boundary
    (r6+r7 ADVICE history: the fixed six-tuple missed indent digits,
    then the digit class wrongly admitted 0). A header swallows the
    following deeper-indented lines; a NON-header value must leave them
    scanning normally — so each case is observable through whether the
    nested value's entity surfaces."""
    from gossiphs_spark.operators.extract import extract_page_yaml

    def nested_ref_emitted(header: bytes) -> bool:
        y = b"x: " + header + b"\n  k: saw Sirius\n"
        names = {r[1] for r in extract_page_yaml("u", y)}
        return "Sirius" in names

    # valid YAML headers: |/> with chomp and/or indent 1-9, either order
    for h in (b"|", b">", b"|-", b">+", b"|2", b">9", b"|+1", b">2-",
              b"|1", b"|9+"):
        assert not nested_ref_emitted(h), h
    # NOT headers (plain scalar values): indent 0 is illegal YAML, two
    # digits, doubled bars, letters — nested lines must keep scanning
    for h in (b"|0", b">0", b"|10", b"||", b"|a", b"|+0", b"|23"):
        assert nested_ref_emitted(h), h


def test_profile_sniff_handles_str_blobs():
    """r5 ADVICE: a string-typed page column must sniff for real instead
    of tallying uniformly as sniff:text."""
    from gossiphs_spark.operators.extract import profile_name_of

    assert profile_name_of("u://page", "<p>hi</p>") == "sniff:html"
    assert profile_name_of("u://page", '{"a": 1}') == "sniff:json"
    assert profile_name_of("u://page", "<?xml version='1.0'?>") == "sniff:xml"
    assert profile_name_of("u://page", "plain words") == "sniff:text"
    # bytes-like variants sniff identically
    assert profile_name_of("u://page", bytearray(b"<p>hi</p>")) == "sniff:html"
    assert profile_name_of("u://page", memoryview(b'{"a":1}')) == "sniff:json"
    # extension still wins over content
    assert profile_name_of("u://page.md", "<p>hi</p>") == "md"


def test_yaml_ini_dispatch():
    from gossiphs_spark.operators.extract import (
        extract_page_ini, extract_page_yaml, profile_name_of, profile_of,
    )

    for url, want_fn, want_name in (
        ("u://a.yml", extract_page_yaml, "yaml"),
        ("u://a.yaml?v=2", extract_page_yaml, "yaml"),
        ("u://a.toml", extract_page_ini, "ini"),
        ("u://a.ini", extract_page_ini, "ini"),
        ("u://a.cfg#frag", extract_page_ini, "ini"),
        ("u://a.conf", extract_page_ini, "ini"),
    ):
        assert profile_of(url) is want_fn, url
        assert profile_name_of(url) == want_name, url


def test_inline_comment_full_quote_state():
    """r6 ADVICE: a comment marker inside a LATER quoted segment is
    literal — the strip scans with full quote state, not just a leading
    quoted span — and an unterminated quote leaves the value whole."""
    from gossiphs_spark.operators.extract import (_strip_inline_comment,
                                                  extract_page_ini)

    # unit: marker inside a non-leading quoted span survives; the real
    # comment after it is cut
    assert _strip_inline_comment('run "a # b" x # c', (" #",)) == 'run "a # b" x'
    assert _strip_inline_comment("mix 'a ; b' # c", (" ;", " #")) == "mix 'a ; b'"
    # unit: unterminated quote -> value untouched (never silently drop
    # quoted content)
    assert (_strip_inline_comment('pre "open # inside', (" #",))
            == 'pre "open # inside')
    # leading-quote and whole-value-comment behavior unchanged
    assert _strip_inline_comment('"a # b" # c', (" #",)) == '"a # b"'
    assert _strip_inline_comment(" # all comment", (" #",)) == ""
    # end-to-end through the INI grammar: Alpha/Beta are literal value
    # content, Gamma is comment prose
    rows = extract_page_ini(
        "u", b'cmd = run "Alpha # Beta" now # Gamma Note\n')
    names = {(r[1], r[2]) for r in rows}
    assert ("Alpha", "REF") in names and ("Beta", "REF") in names
    assert not any(n[0] in ("Gamma", "Note") for n in names)
    # unterminated quote end-to-end: the quoted tail still emits
    rows = extract_page_ini("u", b'cmd = pre "Unter # Xray\n')
    names = {(r[1], r[2]) for r in rows}
    assert ("Unter", "REF") in names and ("Xray", "REF") in names


def test_yaml_block_scalar_explicit_indicators():
    """r6 ADVICE: block-scalar headers with explicit indentation
    indicators (`|2`, `>+1`, `|-3`) are block introducers — their
    literal content lines must not emit keys/values."""
    from gossiphs_spark.operators.extract import extract_page_yaml

    y = (b"title: DocE\n"
         b"script: |2\n"
         b"  fake_key: Cygnus value\n"
         b"after: Phoenix up\n")
    names = {(r[1], r[2]) for r in extract_page_yaml("u", y)}
    assert ("DocE", "DEF") in names and ("Phoenix", "REF") in names
    assert not any(n[0] in ("fake_key", "Cygnus") for n in names)
    for intro in (b">+1", b"|-3", b"|3+", b">1-"):
        y2 = (b"out: " + intro + b"  # note\n"
              b"   Aquila literal\n"
              b"next: Carina\n")
        names2 = {(r[1], r[2]) for r in extract_page_yaml("u", y2)}
        assert ("Carina", "REF") in names2, intro
        assert not any(n[0] == "Aquila" for n in names2), intro
    # a plain scalar value that merely STARTS with | is NOT a block
    y3 = b"cells: | Vega | Altair |\n"
    names3 = {(r[1], r[2]) for r in extract_page_yaml("u", y3)}
    assert ("Vega", "REF") in names3 and ("Altair", "REF") in names3


def test_strip_inline_comment_properties():
    """Property suite for the quote-state scan (r6 ADVICE): on ANY input
    the result is a prefix of the value, never raises, strips nothing
    when no marker exists outside quotes, and is idempotent."""
    from hypothesis import given, settings, strategies as st

    from gossiphs_spark.operators.extract import _strip_inline_comment

    alphabet = st.sampled_from(list("ab #;'\"=:x "))
    values = st.text(alphabet=alphabet, min_size=0, max_size=40)

    @given(val=values)
    @settings(max_examples=400, deadline=None)
    def check(val):
        for markers in ((" #",), (" ;", " #")):
            out = _strip_inline_comment(val, markers)
            assert val.startswith(out)  # always a prefix
            # idempotent: re-stripping the stripped value is a no-op
            # UNLESS the first strip emptied it via the whole-value rule
            if out:
                assert _strip_inline_comment(out, markers) == out
            # no marker anywhere -> untouched
            if not any(m in val for m in markers) and not val.lstrip(
            ).startswith(tuple(m.strip() for m in markers)):
                assert out == val

    check()


def test_extract_page_kv_never_raises_and_offsets_slice():
    """Fuzz the YAML/INI grammars with adversarial text: extraction must
    never raise, and every emitted mention's (start, end) must slice the
    emitted name out of the decoded blob byte-exactly (the offset
    identity-anchor contract, SURVEY §2.9)."""
    from hypothesis import given, settings, strategies as st

    from gossiphs_spark.operators.extract import (extract_page_ini,
                                                  extract_page_yaml)

    alphabet = st.sampled_from(
        list("azAZ09 \t#;'\"|>+-=:[](){},._\n") + ["Alpha", "Beta", ": ", " # "])
    blobs = st.lists(alphabet, min_size=0, max_size=60).map(
        lambda parts: "".join(parts).encode())

    @given(blob=blobs)
    @settings(max_examples=300, deadline=None)
    def check(blob):
        s = blob.decode()
        for fn in (extract_page_yaml, extract_page_ini):
            for row in fn("u", blob):
                url, name, kind, a, b = row[0], row[1], row[2], row[3], row[4]
                assert kind in ("DEF", "REF", "IMPORT", "NAMESPACE")
                assert 0 <= a <= b <= len(s)
                assert s[a:b] == name, (kind, name, s[a:b])

    check()


def test_all_profiles_never_raise_and_offsets_slice():
    """The same fuzz contract over ALL EIGHT grammars in the dispatch
    table (a 100-TB web corpus throws malformed bytes at every profile):
    no extractor may raise, every offset pair must slice the emitted
    name out of the decoded blob byte-exactly, and non-utf8 input must
    decline to [] everywhere. The adversarial alphabet mixes each
    grammar's own structural tokens so fragments of one format flow
    through the others."""
    from hypothesis import given, settings, strategies as st

    from gossiphs_spark.operators.extract import _PROFILE_FNS

    alphabet = st.sampled_from(
        list("azAZ09 \t#;'\"|>+-=:[](){},._\n<>&/\\")
        + ["Alpha", "Beta", ": ", " # ", "<a href=", "</a>", "<title>",
           "</title>", "# ", "[x](y)", '"k":', "<t>", "</t>", "```",
           "&amp;", "---", ",,", "\r\n"])
    blobs = st.lists(alphabet, min_size=0, max_size=50).map(
        lambda parts: "".join(parts).encode())

    @given(blob=blobs)
    @settings(max_examples=200, deadline=None)
    def check(blob):
        s = blob.decode()
        for pname, fn in _PROFILE_FNS.items():
            for row in fn("u", blob):
                name, kind, a, b = row[1], row[2], row[3], row[4]
                assert kind in ("DEF", "REF", "IMPORT", "NAMESPACE"), (
                    pname, kind)
                assert 0 <= a <= b <= len(s), (pname, kind, a, b)
                if pname == "md" and kind == "NAMESPACE" and name == "code":
                    # the ONE non-slice mention in the package: the md
                    # fenced-block REGION marker carries a synthetic
                    # 'code' label; its span must still delimit a real
                    # fence (found by this fuzz, codified deliberately)
                    assert s[a:b].startswith("```") and s[a:b].endswith(
                        "```"), (pname, s[a:b])
                else:
                    assert s[a:b] == name, (pname, kind, name, s[a:b])

    check()
    # non-utf8 declines to [] in every grammar
    from gossiphs_spark.operators.extract import _PROFILE_FNS as P

    for pname, fn in P.items():
        assert fn("u", b"\xff\xfe\x00garbage\x80") == [], pname
