"""Column-expression and pandas-UDF scalar function library."""
