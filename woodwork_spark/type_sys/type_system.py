"""Type registry + inference resolution.

Same registry surface and resolution semantics as the reference
(/root/reference/woodwork/type_sys/type_system.py:104-478): registered
types with optional inference functions, parent->child relationships,
breadth-first tree walk collecting matches, deepest-match-wins with the
reference's explicit tie-breaks, NaturalLanguage as last resort, Unknown
as default.

Inference functions here take a ``ColumnProfile`` (aggregate facts from
one Spark pass — profiles.py).  User-registered functions may instead be
pandas predicates (``Series -> bool``): pass ``pandas_inference=True`` to
``add_type`` and the predicate runs against the bounded driver-side sample
— the compatibility surface matching the reference's arbitrary-callable
contract (type_system.py:143-193).
"""

from __future__ import annotations

from woodwork_spark.logical_types import (
    Age,
    AgeFractional,
    AgeNullable,
    Boolean,
    BooleanNullable,
    Categorical,
    CountryCode,
    CurrencyCode,
    Datetime,
    Double,
    EmailAddress,
    Integer,
    IntegerNullable,
    IPAddress,
    NaturalLanguage,
    Ordinal,
    PhoneNumber,
    PostalCode,
    SubRegionCode,
    Timedelta,
    Unknown,
    URL,
)
from woodwork_spark.type_sys import inference_functions as inf
from woodwork_spark.type_sys.profiles import build_profiles

DEFAULT_INFERENCE_FUNCTIONS = {
    Boolean: inf.boolean_func,
    BooleanNullable: inf.boolean_nullable_func,
    Categorical: inf.categorical_func,
    CountryCode: None,
    CurrencyCode: None,
    Datetime: inf.datetime_func,
    Double: inf.double_func,
    EmailAddress: inf.email_address_func,
    Integer: inf.integer_func,
    IntegerNullable: inf.integer_nullable_func,
    IPAddress: inf.ip_address_func,
    NaturalLanguage: inf.natural_language_func,
    Ordinal: None,
    PhoneNumber: inf.phone_number_func,
    PostalCode: inf.postal_code_func,
    SubRegionCode: None,
    Timedelta: inf.timedelta_func,
    URL: inf.url_func,
    Unknown: None,
}

# (parent, child) — reference type_system.py:79-97
DEFAULT_RELATIONSHIPS = [
    (BooleanNullable, Boolean),
    (Categorical, CountryCode),
    (Categorical, CurrencyCode),
    (Categorical, Ordinal),
    (Categorical, PostalCode),
    (Categorical, SubRegionCode),
    (Double, AgeFractional),
    (Integer, Age),
    (IntegerNullable, AgeNullable),
    (IntegerNullable, Integer),
    (Unknown, EmailAddress),
    (Unknown, IPAddress),
    (Unknown, PhoneNumber),
    (Unknown, PostalCode),
    (Unknown, Timedelta),
    (Unknown, URL),
]


class TypeSystem:
    def __init__(self, inference_functions=None, relationships=None, default_type=Unknown):
        self.default_type = default_type
        self.inference_functions = dict(
            inference_functions
            if inference_functions is not None
            else DEFAULT_INFERENCE_FUNCTIONS,
        )
        self.inference_functions.setdefault(self.default_type, None)
        self.relationships = list(
            relationships if relationships is not None else DEFAULT_RELATIONSHIPS,
        )
        self._pandas_functions = set()
        self._default_inference_functions = dict(self.inference_functions)
        self._default_relationships = list(self.relationships)

    # -- registry surface (reference type_system.py:143-305) -----------------
    @property
    def registered_types(self):
        return list(self.inference_functions.keys())

    @property
    def root_types(self):
        children = {c for _, c in self.relationships}
        return [t for t in self.registered_types if t not in children]

    def add_type(self, logical_type, inference_function=None, parent=None, pandas_inference=False):
        if logical_type in self.inference_functions:
            raise ValueError(f"Logical type {logical_type} is already registered")
        self.inference_functions[logical_type] = inference_function
        if pandas_inference and inference_function is not None:
            self._pandas_functions.add(logical_type)
        if parent is not None:
            self.relationships.append((parent, logical_type))

    def remove_type(self, logical_type):
        logical_type = self._resolve(logical_type)
        if logical_type == self.default_type:
            raise ValueError("Default LogicalType cannot be removed")
        self.inference_functions.pop(logical_type, None)
        self._pandas_functions.discard(logical_type)
        parent = self._get_parent(logical_type)
        # re-parent orphaned children (reference type_system.py:214-227)
        self.relationships = [
            (parent, c) if p == logical_type else (p, c)
            for p, c in self.relationships
            if c != logical_type
        ]
        self.relationships = [
            (p, c) for p, c in self.relationships if p is not None
        ]

    def update_inference_function(self, logical_type, inference_function, pandas_inference=False):
        logical_type = self._resolve(logical_type)
        self.inference_functions[logical_type] = inference_function
        if pandas_inference and inference_function is not None:
            self._pandas_functions.add(logical_type)
        else:
            self._pandas_functions.discard(logical_type)

    def update_relationship(self, logical_type, parent):
        logical_type = self._resolve(logical_type)
        parent = self._resolve(parent)
        self.relationships = [(p, c) for p, c in self.relationships if c != logical_type]
        self.relationships.append((parent, logical_type))

    def reset_defaults(self):
        self.inference_functions = dict(self._default_inference_functions)
        self.relationships = list(self._default_relationships)
        self._pandas_functions = set()

    def _resolve(self, logical_type):
        from woodwork_spark.logical_types import str_to_logical_type

        if isinstance(logical_type, str):
            return type(str_to_logical_type(logical_type))
        return logical_type

    def _get_children(self, parent):
        return [c for p, c in self.relationships if p == parent]

    def _get_parent(self, child):
        for p, c in self.relationships:
            if c == child:
                return p
        return None

    def _get_depth(self, logical_type):
        depth = 0
        parent = self._get_parent(logical_type)
        while parent is not None:
            depth += 1
            parent = self._get_parent(parent)
        return depth

    # -- inference -----------------------------------------------------------
    def _run(self, logical_type, profile):
        func = self.inference_functions.get(logical_type)
        if func is None:
            return False
        if logical_type in self._pandas_functions:
            return bool(func(profile.pandas_series()))
        return bool(func(profile))

    def infer_from_profile(self, profile):
        """Breadth-first tree walk + resolution, same algorithm as the
        reference (type_system.py:360-437): a type with no inference
        function still forwards its children for checking; resolution
        prefers IntegerNullable over Categorical/Double, Double over
        Categorical, then the deepest match (first at that depth wins)."""
        if profile.nonnull == 0:
            return self.default_type()

        type_matches = []

        def check_level(types_to_check):
            check_next = []
            for lt in types_to_check:
                func = self.inference_functions.get(lt)
                if func:
                    matched = self._run(lt, profile)
                    if matched:
                        type_matches.append(lt)
                        check_next.extend(self._get_children(lt))
                else:
                    # no inference function: children may still match
                    check_next.extend(self._get_children(lt))
            if check_next:
                check_level(check_next)

        check_level([t for t in self.root_types if t is not NaturalLanguage])

        if not type_matches:
            if self.inference_functions.get(NaturalLanguage) and self._run(
                NaturalLanguage,
                profile,
            ):
                return NaturalLanguage()
            return self.default_type()
        if len(type_matches) == 1:
            return type_matches[0]()
        if (
            Categorical in type_matches or Double in type_matches
        ) and IntegerNullable in type_matches:
            best = IntegerNullable
        elif Categorical in type_matches and Double in type_matches:
            best = Double
        else:
            best = type_matches[0]
        best_depth = self._get_depth(best)
        for lt in type_matches[1:]:
            d = self._get_depth(lt)
            if d > best_depth:
                best, best_depth = lt, d
        return best()

    def infer_logical_types(self, df, columns=None, sample_size=None):
        """Infer LogicalTypes for ``columns`` of a Spark DataFrame.

        One sample + two wide aggregations for every column (profiles.py),
        then a driver-side tree walk per column.  The cached sample is
        released once every column is resolved.
        """
        profiles = build_profiles(df, columns=columns, sample_size=sample_size)
        try:
            return {name: self.infer_from_profile(p) for name, p in profiles.items()}
        finally:
            for p in profiles.values():
                if p._sample_df is not None:
                    p._sample_df.unpersist()
                break  # all profiles share one sample


type_system = TypeSystem()
