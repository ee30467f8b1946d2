"""Placeholder — real st_* layer lands next."""
st = None
def register_sql(spark):
    raise NotImplementedError
