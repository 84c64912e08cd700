

def test_to_tensor_requires_torch_or_converts(spark):
    """dataframe-hasktorch Hasktorch.hs:50 toTensor — with torch
    absent (this container) the error names the numpy fallback;
    with torch present the shapes must match the reference's
    single-column squeeze."""
    import dataframe_spark as D

    df = D.DataFrame(
        spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], "a double, b double")
    )
    try:
        import torch  # noqa: F401
    except ImportError:
        import pytest

        with pytest.raises(ImportError, match="to_float_matrix"):
            D.to_tensor(df)
        return
    t = D.to_tensor(df)
    assert list(t.shape) == [2, 2]
    one = D.DataFrame(spark.createDataFrame([(1.0,), (2.0,)], "a double"))
    assert list(D.to_tensor(one).shape) == [2]
