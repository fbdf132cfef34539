import pytest

from diffsync_spark.errors import SchemaDeclarationError
from diffsync_spark.model import ModelSchema, TRANSCRIPT_MODEL


def test_declaration_validation():
    # mirrors reference subclass validation tests
    # (/root/reference/tests/unit/test_diffsync_model.py:258 semantics)
    with pytest.raises(SchemaDeclarationError):
        ModelSchema(name="m", identifiers=(), attributes=("a",))
    with pytest.raises(SchemaDeclarationError):
        ModelSchema(name="m", identifiers=("k", "a"), attributes=("a",))
    with pytest.raises(SchemaDeclarationError):
        ModelSchema(name="m", identifiers=("k", "k"), attributes=())
    with pytest.raises(SchemaDeclarationError):
        ModelSchema(name="m", identifiers=("k",), attributes=(), parent_key=("x",))
    m = ModelSchema(name="m", identifiers=("k",), attributes=("a", "b"))
    assert m.attributes == ("a", "b")


def test_validate_frame(spark):
    df = spark.createDataFrame([("c1", 0, "user")], ["conv_id", "turn_idx", "role"])
    TRANSCRIPT_MODEL.validate_frame(df)  # attrs optional (intersection rule)
    with pytest.raises(SchemaDeclarationError):
        TRANSCRIPT_MODEL.validate_frame(df, require_attributes=True)
    with pytest.raises(SchemaDeclarationError):
        TRANSCRIPT_MODEL.validate_frame(df.drop("turn_idx"))


def test_shared_attrs_intersection(spark):
    # schema-evolution rule: one-sided columns never compared
    src = spark.createDataFrame(
        [("c1", 0, "user", "hi", None, "call_1")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, tool_call_id string",
    )
    dst = spark.createDataFrame(
        [("c1", 0, "user", "hi")], ["conv_id", "turn_idx", "role", "text"]
    )
    assert TRANSCRIPT_MODEL.shared_attrs(src, dst) == ["role", "text"]


def test_uid_and_shortname(spark):
    df = spark.createDataFrame([("c1", 3)], ["conv_id", "turn_idx"])
    row = df.select(
        TRANSCRIPT_MODEL.uid_col().alias("uid"),
        TRANSCRIPT_MODEL.shortname_col().alias("short"),
    ).first()
    assert row.uid == "c1__3"  # reference create_unique_id join-on-"__"
    assert row.short == "3"
