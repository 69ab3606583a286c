"""Unit tests for the numpy-dialect -> Spark SQL translator (the
keystone per SURVEY.md §7 phase 1). Golden translations + divergence
cases (**, &|~, //, %, in, aliases, exprvars)."""

import pytest

from ezdata_spark.expr import ExprError, translate

COLS = ["logT", "J", "x", "y", "l_quantity"]


def sql(expr, **kw):
    return translate(expr, COLS, **kw).sql


def test_comparison_and_mask():
    assert sql("(J > 2) & (logT < 5)") == "((`J` > 2) AND (`logT` < 5))"
    assert sql("(J > 2) | ~(logT < 5)") == "((`J` > 2) OR (NOT (`logT` < 5)))"


def test_power_operator():
    assert sql("10**logT + J") == "(power(10, `logT`) + `J`)"


def test_floor_div_and_mod():
    assert sql("x // 3") == "floor(`x` / 3)"
    assert sql("x % 3") == "pmod(`x`, 3)"


def test_numpy_function_mapping():
    assert sql("log10(x)") == "log10(`x`)"
    assert sql("arcsin(x)") == "asin(`x`)"
    assert sql("arctan2(y, x)") == "atan2(`y`, `x`)"
    assert sql("np.sqrt(x)") == "sqrt(`x`)"
    assert sql("degrees(x)") == "degrees(`x`)"
    assert sql("maximum(x, y)") == "greatest(`x`, `y`)"


def test_where_clip_special_forms():
    assert sql("where(x > 0, x, y)") == "IF((`x` > 0), `x`, `y`)"
    assert sql("clip(x, 0, 1)") == "least(greatest(`x`, 0), 1)"


def test_constants():
    assert sql("pi") == "pi()"
    assert "NaN" in sql("nan")


def test_chained_comparison():
    assert sql("0 < x < 1") == "(0 < `x` AND `x` < 1)"


def test_in_list():
    assert sql("x in (1, 2, 3)") == "(`x` IN (1, 2, 3))"


def test_conditional_expression():
    assert sql("x if J > 0 else y") == "IF((`J` > 0), `x`, `y`)"


def test_exprvars_bound_as_literals():
    assert sql("x > cut", exprvars={"cut": 1.5}) == "(`x` > 1.5)"
    assert sql("y == tag", exprvars={"tag": "it's"}) == "(`y` = 'it\\'s')"


def test_alias_resolution_recursive():
    aliases = {"MAG": "J", "BRIGHT": "MAG < 10"}
    assert translate("BRIGHT", COLS, aliases=aliases).sql == "(((`J`) < 10))"


def test_caseless_alias_and_column():
    assert translate("logt > 1", COLS, caseless=True).sql == "(`logT` > 1)"


def test_columns_used_tracking():
    r = translate("log10(x) + y", COLS)
    assert r.columns_used == {"x", "y"}


def test_fallback_numpy_fn_collected():
    r = translate("heaviside(x, 0.5)", COLS)
    assert r.fallback_fns == {"heaviside"}
    assert "ez_np_heaviside" in r.sql


def test_unknown_name_raises():
    with pytest.raises(ExprError):
        sql("nope + 1")


def test_unknown_function_raises():
    with pytest.raises(ExprError):
        sql("definitely_not_numpy(x)")


def test_lambda_rejected():
    with pytest.raises(ExprError):
        sql("(lambda v: v)(x)")


def test_attribute_access_rejected_except_np():
    with pytest.raises(ExprError):
        sql("os.system(x)")


def test_keyword_args_rejected():
    with pytest.raises(ExprError):
        sql("round(x, decimals=2)")
