"""Introspection helpers (reference type_sys/utils.py:68-138)."""

from __future__ import annotations

import pandas as pd

from woodwork_spark.logical_types import ALL_LOGICAL_TYPES
from woodwork_spark.type_sys.type_system import type_system


def list_logical_types():
    """DataFrame of all logical types with physical type, standard tags,
    and registry status."""
    registered = set(type_system.registered_types)
    rows = []
    for lt in ALL_LOGICAL_TYPES:
        rows.append(
            {
                "name": lt.__name__,
                "type_string": lt.type_string(),
                "physical_type": lt.spark_dtype.simpleString(),
                "standard_tags": sorted(lt.standard_tags),
                "is_default_type": lt in registered,
                "is_registered": lt in registered,
                "parent_type": next(
                    (p.__name__ for p, c in type_system.relationships if c is lt),
                    None,
                ),
            },
        )
    return pd.DataFrame(rows)


def list_semantic_tags():
    """DataFrame of standard semantic tags and the types they come from."""
    rows = [
        {"name": "index", "is_standard_tag": False, "valid_logical_types": "Any"},
        {"name": "time_index", "is_standard_tag": False, "valid_logical_types": "Datetime/numeric"},
    ]
    for tag in ("numeric", "category"):
        types = [lt.__name__ for lt in ALL_LOGICAL_TYPES if tag in lt.standard_tags]
        rows.append(
            {"name": tag, "is_standard_tag": True, "valid_logical_types": types},
        )
    return pd.DataFrame(rows)
