"""Fixed Arrow schemas for every stage boundary.

The reference has no schema system (Python objects + JSON-in-NTEXT,
SURVEY.md §1.1); here every Dataset boundary is a declared
``pyarrow.Schema``, validated at read and write time.

The ``documents`` schema is the BASELINE.json ``input_hint`` shape — a
Lance-shaped table of interleaved text + media documents (Parquet in this
sandbox; ``ray.data.read_lance`` is a one-line swap where Lance exists).
"""

from __future__ import annotations

import pyarrow as pa

# Input span kinds: "html" (markup chunk) | "media" (image/audio ref).
# Output span kinds: "text" | "table_cell" | "media".
SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

EXTRACTED = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part", pa.int32()),                    # hash(doc_id) % P partition key
        ("spans", pa.list_(SPAN_STRUCT)),        # ordered output span sequence
        ("entities_json", pa.string()),          # reference-shaped entity list
        ("relations_json", pa.string()),         # reference-shaped triple list
        ("n_tables", pa.int32()),
        ("n_spans", pa.int32()),
        ("n_entities", pa.int32()),
        ("n_relations", pa.int32()),
        ("error", pa.string()),                  # "" = ok; else quarantined
    ]
)

ENTITIES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("subject", pa.string()),
        ("subject_url", pa.string()),
        ("props", pa.map_(pa.string(), pa.string())),
    ]
)

RELATIONS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("s_name", pa.string()),
        ("s_url", pa.string()),
        ("rel", pa.string()),
        ("o_name", pa.string()),
        ("o_url", pa.string()),
    ]
)

NODES = pa.schema(
    [
        ("name", pa.string()),
        ("url", pa.string()),
        ("props", pa.map_(pa.string(), pa.string())),
        ("n_sources", pa.int64()),
    ]
)

EDGES = RELATIONS  # deduped by the 5-tuple (s_name, s_url, rel, o_name, o_url)

# EXTRACTED as it round-trips through parquet (list value field renamed to
# "element") — reassembled tables cast to this so unions with parquet-read
# datasets are schema-identical.
EXTRACTED_PARQUET = pa.schema(
    [f if f.name != "spans"
     else pa.field("spans", pa.list_(pa.field("element", SPAN_STRUCT)))
     for f in EXTRACTED]
)

MANIFEST = pa.schema(
    [
        ("part", pa.int32()),
        ("n_docs", pa.int64()),
        ("n_spans", pa.int64()),
        ("n_entities", pa.int64()),
        ("n_relations", pa.int64()),
        ("n_errors", pa.int64()),
        ("content_hash", pa.string()),
        ("lineage", pa.string()),               # JSON: input doc_id range info
    ]
)


def validate(table: pa.Table, schema: pa.Schema, where: str = "") -> pa.Table:
    """Assert-and-cast a batch to the declared stage schema."""
    try:
        return table.select(schema.names).cast(schema)
    except (KeyError, pa.ArrowInvalid, pa.ArrowTypeError,
            pa.ArrowNotImplementedError) as e:
        raise ValueError(
            f"schema mismatch at {where or 'stage boundary'}: "
            f"got {table.schema}, want {schema}") from e
