"""Sidecar storage (S8/S9, reference docprompt/storage.py:18-235): the
hash-addressed {base}/{hash}/base.pdf layout, CRUD round-trips, and the
executor-side distributed writer."""

import gzip
import os

from docprompt_spark import storage


def test_layout_matches_reference_scheme(tmp_path):
    p = storage.sidecar_paths(str(tmp_path), "abc123")
    assert p["pdf"].endswith("abc123/base.pdf")
    assert p["metadata"].endswith("abc123/base.json")
    assert p["page_metadata"].endswith("abc123/pages.json")


def test_write_read_delete_roundtrip(tmp_path):
    pdf = b"%PDF-1.4 fake"
    paths = storage.write_sidecar(
        str(tmp_path), pdf, metadata={"k": 1}, page_metadata=[{"p": 1}]
    )
    fh = storage.file_hash_of(pdf)
    assert os.path.exists(paths["pdf"])
    got, meta, pages = storage.read_sidecar(str(tmp_path), fh)
    assert got == pdf and meta == {"k": 1} and pages == [{"p": 1}]
    assert storage.delete_sidecar(str(tmp_path), fh)
    assert not os.path.exists(os.path.dirname(paths["pdf"]))
    assert not storage.delete_sidecar(str(tmp_path), fh)


def test_compressed_member_marked_by_name(tmp_path):
    pdf = b"%PDF-1.4 " + b"x" * 4000
    storage.write_sidecar(str(tmp_path), pdf, compress=True)
    fh = storage.file_hash_of(pdf)
    raw = open(
        storage.sidecar_paths(str(tmp_path), fh)["pdf"] + ".gz", "rb"
    ).read()
    assert raw[:2] == b"\x1f\x8b" and len(raw) < len(pdf)
    got, _, _ = storage.read_sidecar(str(tmp_path), fh)
    assert got == pdf
    # byte-deterministic gzip (mtime pinned)
    assert raw == gzip.compress(pdf, 5, mtime=0)


def test_gzip_wrapped_document_bytes_survive_verbatim(tmp_path):
    """A document whose BYTES are a gzip envelope (corpus idx%4 wrapper)
    must round-trip verbatim — compression is name-marked, never
    content-sniffed."""
    wrapped = gzip.compress(b"%PDF-1.4 inner", 5, mtime=0)
    storage.write_sidecar(str(tmp_path), wrapped)
    got, _, _ = storage.read_sidecar(str(tmp_path), storage.file_hash_of(wrapped))
    assert got == wrapped


def test_distributed_writer_executor_side(spark, tmp_path):
    """write_sidecars_df: sidecars appear for every corpus doc, written
    from executors; the manifest joins doc_id -> file_hash; read_sidecar
    returns the exact bytes the corpus generated."""
    from docprompt_spark import pipeline

    base = str(tmp_path / "sc")
    docs = pipeline.corpus_df(spark, 8, seed=23, skew_every=0).select(
        "doc_id", "pdf", "n_pages"
    )
    manifest = storage.write_sidecars_df(docs, base).collect()
    assert len(manifest) == 8
    originals = {r["doc_id"]: bytes(r["pdf"]) for r in docs.collect()}
    for row in manifest:
        pdf, meta, _ = storage.read_sidecar(base, row["file_hash"])
        assert pdf == originals[row["doc_id"]]
        assert meta["doc_id"] == row["doc_id"] and meta["n_pages"] >= 1
