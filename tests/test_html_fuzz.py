"""Hypothesis fuzz of the stdlib HTML table source (S1-S5 surface).

The reference scrapes real pages (bs4, ipynb:72-162); this engine's
parser is a stdlib HTMLParser subclass, so adversarial-but-valid markup
is the risk surface: attribute noise, entity escapes, irregular
whitespace, interleaved non-table elements, multiple tables, rows of
uneven width. The property: whatever well-formed table we GENERATE, the
parser must extract exactly the cell texts we put in, in order --
across all of that noise. Pure-Python (no Spark session), so hundreds of
examples stay cheap.
"""

from __future__ import annotations

import html as html_lib

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_world_banks_with_python_and_postgresql_spark.sources.html_table import (
    element_text,
    parse_html,
    sniff_year,
)

# cell text: printable, no tags; entities handled by escaping on build
cell_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Zs"), blacklist_characters="<>&"
    ),
    min_size=0,
    max_size=12,
)

table_data = st.lists(
    st.lists(cell_text, min_size=1, max_size=5), min_size=1, max_size=6
)

noise_attr = st.sampled_from(
    ["", ' class="x y"', ' style="color: red"', ' data-k="1"', " hidden"]
)
ws = st.sampled_from(["", " ", "\n", "\t\n  "])


def build_table(data, attr, w):
    rows = []
    for row in data:
        cells = "".join(
            f"<td{attr}>{w}{html_lib.escape(c)}{w}</td>" for c in row
        )
        rows.append(f"{w}<tr{attr}>{cells}</tr>")
    return f"<table{attr}><tbody>{''.join(rows)}{w}</tbody></table>"


@given(data=table_data, attr=noise_attr, w=ws, pre=cell_text, post=cell_text)
@settings(max_examples=200, deadline=None)
def test_generated_tables_round_trip(data, attr, w, pre, post):
    page = (
        f"<html><head><title>t</title></head><body><p>{html_lib.escape(pre)}</p>"
        f"<div><span>noise</span></div>"
        + build_table(data, attr, w)
        + f"<ul><li>{html_lib.escape(post)}</li></ul></body></html>"
    )
    tables, _ = parse_html(page)
    assert len(tables) == 1
    got = [[c.strip() for c in r] for r in tables[0].rows]
    want = [[c.strip() for c in row] for row in data]
    assert got == want


@given(
    data1=table_data,
    data2=table_data,
    attr=noise_attr,
    w=ws,
)
@settings(max_examples=100, deadline=None)
def test_multiple_tables_keep_positions(data1, data2, attr, w):
    """S2's positional contract: tbody[2]-style indexing must see tables
    in document order regardless of markup noise between them."""
    page = (
        "<body>"
        + build_table(data1, attr, w)
        + "<p>between</p>"
        + build_table(data2, "", "")
        + "</body>"
    )
    tables, _ = parse_html(page)
    assert len(tables) == 2
    assert [[c.strip() for c in r] for r in tables[0].rows] == [
        [c.strip() for c in row] for row in data1
    ]
    assert [[c.strip() for c in r] for r in tables[1].rows] == [
        [c.strip() for c in row] for row in data2
    ]


@given(txt=cell_text, eid=st.sampled_from(["footer-info-lastmod", "x1"]))
@settings(max_examples=100, deadline=None)
def test_element_text_by_id(txt, eid):
    page = f'<body><div id="{eid}">{html_lib.escape(txt)}</div></body>'
    assert element_text(page, eid) == txt.strip()
    assert element_text(page, "absent-id") is None


@given(
    years=st.lists(
        st.one_of(
            st.integers(min_value=1000, max_value=9999).map(str),
            cell_text,
        ),
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_sniff_year_finds_first_4_digit(years):
    want = next(
        (int(h) for h in (y.strip() for y in years)
         if h.isdigit() and len(h) == 4),
        None,
    )
    assert sniff_year(years) == want


# ---------------------------------------------------------------------
# JPEG decoder fuzz (same contract as the HTML source fuzz above: no
# input may hang, crash the worker, or escape with a non-contract
# exception -- corrupt bytes must surface as ValueError /
# NotImplementedError, never IndexError/KeyError/struct.error/hangs)
# ---------------------------------------------------------------------


@given(st.data())
@settings(max_examples=300, deadline=None)
def test_jpeg_decoder_survives_byte_mutations(data):
    from etl_world_banks_with_python_and_postgresql_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 13, 10
    px = [
        (20 + 2 * x + 3 * y, 30 + 3 * x + y, 25 + x + 2 * y)
        for y in range(h)
        for x in range(w)
    ]
    valid = encode_jpeg(px, w, h, quality=90)
    mutated = bytearray(valid)
    n_mut = data.draw(st.integers(1, 6))
    for _ in range(n_mut):
        i = data.draw(st.integers(0, len(mutated) - 1))
        mutated[i] = data.draw(st.integers(0, 255))
    if data.draw(st.booleans()):
        mutated = mutated[: data.draw(st.integers(0, len(mutated)))]
    try:
        got = decode_jpeg(bytes(mutated), max_pixels=1 << 20)
    except (ValueError, NotImplementedError):
        return  # contract: corrupt bytes fail loudly with these two
    gw, gh, nc, out = got
    assert len(out) == gw * gh
    assert nc in (1, 3)
