"""CSV source adapter: quoting round-trip, corrupt-line quarantine,
TSV separator, ingest end-to-end."""

from accumulo_wikisearch_spark.sources.csv import (
    corrupt_record_stats_csv,
    load_articles_csv,
    read_documents_csv,
)


def test_csv_quoting_roundtrip(spark, tmp_path):
    out = str(tmp_path / "c")
    docs = spark.createDataFrame(
        [
            (1, 'has, comma and "quotes" inside', "en", "s1", None),
            (2, "plain text", "fr", "s2", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.option("header", "true").csv(out)
    back = {r["doc_id"]: r for r in read_documents_csv(spark, out).collect()}
    assert back[1]["text"] == 'has, comma and "quotes" inside'
    assert back[1]["n_chars"] == len(back[1]["text"])  # derived
    assert back[2]["n_chars"] == 10


def test_csv_corrupt_quarantine_and_tsv(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,alpha beta,en,s1,10\n"
        "not_a_number,broken,en,s1,xx\n"
        "2,gamma,fr,s2,5\n"
    )
    good = read_documents_csv(spark, str(p))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    stats = corrupt_record_stats_csv(spark, str(p)).collect()[0]
    assert (stats["n_good"], stats["n_corrupt"]) == (2, 1)
    t = tmp_path / "d.tsv"
    t.write_text("doc_id\ttext\tlang\tsource\tn_chars\n3\tdelta eps\ten\ts1\t9\n")
    arts = load_articles_csv(spark, str(t), sep="\t").collect()
    assert len(arts) == 1 and arts[0]["text"] == "delta eps"
