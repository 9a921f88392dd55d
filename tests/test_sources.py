"""Source adapter tests: CSV scan and the nested graph-document JSON
flatten (fixtures synthesized in the reference's shape — SURVEY §1.1)."""

from __future__ import annotations

import json

from acuvate_spark.operators import sources


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "master.csv"
    p.write_text(
        "Country,Level,SKU,quant,Yearmonth,Source,Update1\n"
        "Austria,,SKU-1,120,202304,VPD,\n"
        "NO,Total National sales,SKU-2,55,202305,IMD,\n"
    )
    df = sources.read_csv(
        spark,
        str(p),
        "Country string, Level string, SKU string, quant long, Yearmonth int, "
        "Source string, Update1 string",
    )
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["quant"] == 120 and rows[1]["Source"] == "IMD"


def _fixture_doc(doc_id: str) -> dict:
    return {
        "Asset": {
            "Instrument": {
                "Indicator": [
                    {
                        "id": f"{doc_id}-1",
                        "label": "PIT-1450",
                        "score": 0.91,
                        "Document_ID": doc_id,
                        "text_associated": "Instrument",
                        "connections": [
                            {
                                "asset_key": f"{doc_id}-2",
                                "flow_direction": "out",
                                "segments": [[[0, 0], [5, 0]], [[5, 0], [5, 5]]],
                            }
                        ],
                    },
                    {
                        "id": f"{doc_id}-2",
                        "label": "F-1158-A",
                        "score": 0.84,
                        "Document_ID": doc_id,
                        "text_associated": "Tag",
                        "connections": [],
                    },
                ]
            }
        }
    }


def test_nested_json_flatten(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    for i in range(3):
        (d / f"doc{i}.json").write_text(json.dumps(_fixture_doc(f"D{i}")))
    docs = sources.read_graph_documents(spark, str(d))
    comps = sources.flatten_components(docs)
    assert comps.count() == 6
    conns = sources.explode_connections(comps)
    edges = conns.where(conns.to_component.isNotNull()).collect()
    assert len(edges) == 3
    assert all(e["n_segments"] == 2 for e in edges)
    leaves = conns.where(conns.to_component.isNull()).count()
    assert leaves == 3  # explode_outer keeps connection-less components
