from .binned_agg import BinSpec, binned_agg, geo_aggregate
from .enrich import add_lookup_column

__all__ = ["BinSpec", "binned_agg", "geo_aggregate", "add_lookup_column"]
