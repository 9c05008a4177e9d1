"""Golden + property tests for the chunker (reference semantics:
``chunk_text``, src/PDFToChromaIngester.py:94-124).  These are the
correctness gate for q_chunk_explode (not SQL-expressible)."""

import pathlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_db_ingestor_spark.operators.chunker import chunk_documents, chunk_text

REFERENCE_CHUNKER = pathlib.Path("/root/reference/src/PDFToChromaIngester.py")


def test_short_text_passes_through_whole():
    # len(text) <= chunk_size -> [text], unstripped (reference quirk)
    assert chunk_text("  short  ", chunk_size=600) == ["  short  "]
    assert chunk_text("x" * 600, chunk_size=600) == ["x" * 600]


def test_golden_sentence_snap():
    t = "abc. " + "x" * 100 + ". tail words here"
    assert chunk_text(t, chunk_size=50, overlap=10) == [
        "abc. " + "x" * 45,
        "x" * 50,
        "x" * 25 + ". tail words here",
        "re",  # stride from the snapped cut re-enters the tail (quirk kept)
    ]


def test_golden_no_sentence_ends():
    t = ("word " * 50).strip()
    out = chunk_text(t, chunk_size=60, overlap=10)
    assert out == ["word " * 11 + "word"] * 4 + ["word " * 9 + "word"]


def test_golden_all_end_kinds():
    t = "A" * 45 + ". " + "B" * 45 + "! " + "C" * 30 + "? " + "D" * 60
    assert chunk_text(t, chunk_size=50, overlap=10) == [
        "A" * 45 + ".",
        "A" * 8 + ". " + "B" * 40,
        "B" * 15 + "! " + "C" * 30 + "?",
        "C" * 8 + "? " + "D" * 40,
        "D" * 30,
    ]


def test_golden_paragraph_breaks():
    t = "para one.\n\npara two continues here with more text.\n\npara three."
    assert chunk_text(t, chunk_size=30, overlap=10) == [
        "para one.\n\npara two continues",
        "continues here with more text.",
        "more text.\n\npara three.",
        "ee.",
    ]


def test_chunks_are_stripped_and_nonempty():
    t = ("hello world. " * 100).strip()
    for chunk in chunk_text(t, chunk_size=80, overlap=20):
        assert chunk == chunk.strip()
        assert chunk


@pytest.mark.skipif(not REFERENCE_CHUNKER.exists(), reason="reference not present")
def test_parity_with_reference_implementation():
    """Behavioral parity with the reference's own chunk_text, extracted
    dynamically (never vendored) from the read-only snapshot."""
    import ast
    import textwrap

    src = REFERENCE_CHUNKER.read_text()
    tree = ast.parse(src)
    fn = next(
        node
        for node in ast.walk(tree)
        if isinstance(node, ast.FunctionDef) and node.name == "chunk_text"
    )
    code = textwrap.dedent(ast.get_source_segment(src, fn))
    ns = {"List": list}
    exec(compile(ast.parse(code), "<reference-chunk_text>", "exec"), ns)  # noqa: S102
    ref_chunk = ns["chunk_text"]

    samples = [
        "short",
        "x" * 601,
        ("alpha beta. gamma! delta? " * 60).strip(),
        "A" * 45 + ". " + "B" * 45 + "! " + "C" * 30 + "? " + "D" * 60,
        "p1.\n\np2 with words.\n\np3." * 20,
        " . ".join(["seg" + str(i) for i in range(200)]),
        "\n\n".join(["para " + "w" * (i % 37) for i in range(50)]),
    ]
    for text in samples:
        for cs, ov in [(600, 50), (150, 20), (80, 10)]:
            assert chunk_text(text, cs, ov) == ref_chunk(None, text, cs, ov), (
                f"divergence for cs={cs} ov={ov} on {text[:40]!r}"
            )


def test_chunk_documents_matches_pure_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    rows = docs.collect()
    expected = {
        (r.doc_id, i, c)
        for r in rows
        for i, c in enumerate(chunk_text(r.text, 150, 20))
    }
    got = {
        (r.doc_id, r.chunk_index, r.chunk)
        for r in chunk_documents(docs, chunk_size=150, overlap=20).collect()
    }
    assert got == expected


# -- property: optimized boundary scan == reference's naive scan -------

def _naive_chunk(text, chunk_size, overlap):
    """Verbatim port of the reference scan loop
    (src/PDFToChromaIngester.py:94-124) used as the property oracle."""
    if len(text) <= chunk_size:
        return [text]
    chunks, start, n = [], 0, len(text)
    while start < n:
        end = start + chunk_size
        if end < n:
            best = -1
            for i in range(end - overlap, end):
                for ending in (". ", "! ", "? ", "\n\n"):
                    if text[i : i + len(ending)] == ending:
                        best = i + len(ending)
            if best != -1:
                end = best
        piece = text[start:end].strip()
        if piece:
            chunks.append(piece)
        start = end - overlap
    return chunks


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet=" .!?\nabcdef", max_size=400),
    st.integers(min_value=12, max_value=80),
    st.integers(min_value=2, max_value=11),
)
def test_chunk_text_matches_reference_scan(text, chunk_size, overlap):
    assert chunk_text(text, chunk_size, overlap) == _naive_chunk(
        text, chunk_size, overlap
    )


def test_chunker_oracle_matches_python_on_random_texts():
    """Property test: the recursive-CTE oracle (queries._chunker_oracle)
    equals chunk_text on arbitrary texts with sentence endings,
    whitespace runs (including Unicode whitespace: NBSP, NEL, en-space,
    ideographic space, \\x1c — everything Python str.strip() eats),
    and boundary-straddling punctuation — not just on the fixture
    corpus."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    from vector_db_ingestor_spark.queries import _chunker_oracle

    sql = _chunker_oracle(chunk_size=150, overlap=20)

    alphabet = st.sampled_from(
        list("abcdefg ")
        + [". ", "! ", "? ", "\n\n", ".", "!", "?", "\n", "  "]
        + ["\xa0", "\x85", " ", "　", "\x1c", " "]
    )
    texts = st.lists(alphabet, min_size=0, max_size=120).map("".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(texts, min_size=1, max_size=8))
    def check(batch):
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", list(enumerate(batch))
        )
        duck = {
            (r[0], r[1]): r[2]
            for r in con.execute(sql).fetchall()
        }
        py = {}
        for doc_id, text in enumerate(batch):
            for i, c in enumerate(chunk_text(text, 150, 20)):
                py[(doc_id, i)] = c
        assert duck == py

    check()
