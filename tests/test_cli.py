"""CLI end-to-end: index a directory of text documents, then query —
the reference's whole user journey (index_documents.py CLI + the
pgvector top-k query it delegates) in two commands."""

from __future__ import annotations

import pytest

from document_vector_indexer_spark.cli import main


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_docs")
    (d / "spark.txt").write_text(
        "Apache Spark executes declarative dataframe plans with catalyst. "
        "A sort merge join shuffles both sides by the join key. "
        "Broadcast joins ship the small side to every executor." * 3
    )
    (d / "duck.txt").write_text(
        "DuckDB is an in-process analytical database. "
        "Vectorized execution processes column batches. " * 3
    )
    (d / "cooking.txt").write_text(
        "Slice the onions finely and caramelize them slowly in butter. " * 4
    )
    return d


def test_cli_index_then_query(spark, doc_dir, tmp_path, capsys):
    out = str(tmp_path / "chunks")
    main(
        [
            "index", str(doc_dir),
            "--strategy", "fixed", "--chunk-size", "200", "--overlap", "40",
            "--embedding-dim", "32", "--output", out,
        ]
    )
    assert "Done. Indexed" in capsys.readouterr().out

    chunk_df = spark.read.parquet(out)
    assert chunk_df.count() > 3
    assert set(chunk_df.columns) == {
        "id", "chunk_text", "embedding", "filename", "split_strategy",
        "chunk_pos", "created_at",
    }

    main(["query", "--chunks", out, "--text",
          "how does a sort merge join shuffle", "--k", "3"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("[")]
    assert len(lines) == 3
    # the spark doc must outrank cooking content for a join query
    assert "spark.txt" in lines[0]


def test_cli_index_parquet_input(tmp_path, capsys):
    out = str(tmp_path / "chunks_pq")
    main(
        [
            "index", "/root/testdata/sf0.001/documents.parquet",
            "--strategy", "paragraph", "--embedding-dim", "16",
            "--output", out,
        ]
    )
    assert "Done. Indexed" in capsys.readouterr().out
