"""OctoSQL-style type algebra over Spark types (SURVEY.md §1.2).

The reference's types (octosql/types.go:11-24): Null, Int, Float,
Boolean, String, Time, Duration, List, Struct, Tuple, Union, Any —
with subtyping ``Is/Maybe/Isnt`` (types.go:97-178) and least-upper-
bound ``TypeSum`` (types.go:239-382) used pervasively by schema
inference.

Spark has no union type, so ``to_spark`` applies the documented
policy (SURVEY.md §7 hard-part 1):
1. ``T | NULL``            → nullable T;
2. union of numerics       → widen (Int|Float → Float);
3. anything else           → the raw value is kept as a STRING column
   and accessed through typed accessors (``try_cast`` — the
   reference's own internal TypeCast is exactly "NULL if the runtime
   type differs", execution/expressions.go:79-102).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import types as T


class TypeID(Enum):
    NULL = 0
    INT = 1
    FLOAT = 2
    BOOLEAN = 3
    STRING = 4
    TIME = 5
    DURATION = 6
    LIST = 7
    STRUCT = 8
    TUPLE = 9
    UNION = 10
    ANY = 11


@dataclass(frozen=True)
class OctoType:
    id: TypeID
    elem: "OctoType | None" = None                      # LIST
    fields: tuple[tuple[str, "OctoType"], ...] = ()     # STRUCT
    elems: tuple["OctoType", ...] = ()                  # TUPLE
    alts: frozenset = frozenset()                       # UNION

    def __repr__(self) -> str:
        """The reference's Type.String() rendering exactly
        (octosql/types.go:180-226): ``NULL`` uppercase, struct fields
        ``; ``-joined, union alternatives `` | ``-joined in TypeID
        order."""
        if self.id == TypeID.NULL:
            return "NULL"
        if self.id == TypeID.LIST:
            return f"[{self.elem!r}]"
        if self.id == TypeID.STRUCT:
            inner = "; ".join(f"{n}: {t!r}" for n, t in self.fields)
            return "{" + inner + "}"
        if self.id == TypeID.UNION:
            return " | ".join(repr(a) for a in
                              sorted(self.alts, key=lambda a: a.id.value))
        if self.id == TypeID.TUPLE:
            return "(" + ", ".join(repr(e) for e in self.elems) + ")"
        return self.id.name.capitalize()


NULL = OctoType(TypeID.NULL)
INT = OctoType(TypeID.INT)
FLOAT = OctoType(TypeID.FLOAT)
BOOLEAN = OctoType(TypeID.BOOLEAN)
STRING = OctoType(TypeID.STRING)
TIME = OctoType(TypeID.TIME)
DURATION = OctoType(TypeID.DURATION)
ANY = OctoType(TypeID.ANY)


def list_of(elem: OctoType) -> OctoType:
    return OctoType(TypeID.LIST, elem=elem)


def struct_of(fields: dict[str, OctoType]) -> OctoType:
    return OctoType(TypeID.STRUCT, fields=tuple(sorted(fields.items())))


def union_of(*types: OctoType) -> OctoType:
    """Normalized union: alternatives flatten, and same-TypeID
    alternatives deep-merge (types.go:349-360 — "We only want each
    TypeID once in the union"). Normalization is what makes the
    TypeSum lattice commutative/associative (property-tested)."""
    flat: list[OctoType] = []
    for t in types:
        if t.id == TypeID.UNION:
            flat.extend(t.alts)
        else:
            flat.append(t)
    by_id: dict[TypeID, OctoType] = {}
    for t in flat:
        if t.id == TypeID.ANY:
            continue  # Any absorbs nothing here
        if t.id in by_id:
            by_id[t.id] = type_sum(by_id[t.id], t)
        else:
            by_id[t.id] = t
    alts = frozenset(by_id.values())
    if len(alts) == 1:
        return next(iter(alts))
    return OctoType(TypeID.UNION, alts=alts)


def type_sum(a: OctoType, b: OctoType) -> OctoType:
    """Least upper bound — the reference's TypeSum
    (octosql/types.go:239-382): deep-merges structs/lists/tuples,
    merges non-union operands into a union's same-TypeID alternative
    (:348-360), otherwise forms a union. Int ⊔ Float is a union like
    the reference (the widening to Double happens at ``to_spark``).
    Associative and commutative (property-tested)."""
    if a == b:
        return a
    if a.id == TypeID.ANY or b.id == TypeID.ANY:
        return ANY
    if a.id == TypeID.UNION and b.id == TypeID.UNION:
        out = a
        for alt in b.alts:
            out = type_sum(out, alt)
        return out
    if b.id == TypeID.UNION:
        return type_sum(b, a)
    if a.id == TypeID.UNION:
        # union_of normalizes: b deep-merges into the same-TypeID
        # alternative if present, else appends
        return union_of(a, b)
    if a.id == b.id == TypeID.LIST:
        return list_of(type_sum(a.elem, b.elem))
    if a.id == b.id == TypeID.STRUCT:
        fa, fb = dict(a.fields), dict(b.fields)
        merged: dict[str, OctoType] = {}
        for name in sorted(set(fa) | set(fb)):
            if name in fa and name in fb:
                merged[name] = type_sum(fa[name], fb[name])
            else:
                # a field absent on one side is nullable (types.go:247-288)
                merged[name] = union_of(fa.get(name, fb.get(name)), NULL)
        return struct_of(merged)
    if a.id == b.id == TypeID.TUPLE:
        # different arities deep-merge: shorter pads with NULL
        # (types.go:308-332)
        longer, shorter = (a.elems, b.elems) if len(a.elems) >= len(b.elems) \
            else (b.elems, a.elems)
        elems = [type_sum(x, y) for x, y in zip(longer, shorter)]
        elems += [type_sum(x, NULL) for x in longer[len(shorter):]]
        return OctoType(TypeID.TUPLE, elems=tuple(elems))
    return union_of(a, b)


class Is(Enum):
    IS = 0
    MAYBE = 1
    ISNT = 2


def is_subtype(a: OctoType, b: OctoType) -> Is:
    """``a.Is(b)`` (types.go:97-178): IS = every a-value is a b-value;
    MAYBE = some are (runtime-checked use); ISNT = none."""
    if b.id == TypeID.ANY or a == b:
        return Is.IS
    if a.id == TypeID.UNION:
        rs = [is_subtype(x, b) for x in a.alts]
        if all(r == Is.IS for r in rs):
            return Is.IS
        if any(r != Is.ISNT for r in rs):
            return Is.MAYBE
        return Is.ISNT
    if b.id == TypeID.UNION:
        rs = [is_subtype(a, x) for x in b.alts]
        if any(r == Is.IS for r in rs):
            return Is.IS
        if any(r == Is.MAYBE for r in rs):
            return Is.MAYBE
        return Is.ISNT
    if a.id == b.id == TypeID.LIST:
        return is_subtype(a.elem, b.elem)
    if a.id == b.id == TypeID.STRUCT:
        fa, fb = dict(a.fields), dict(b.fields)
        if set(fa) != set(fb):
            return Is.ISNT
        rs = [is_subtype(fa[n], fb[n]) for n in fa]
        if all(r == Is.IS for r in rs):
            return Is.IS
        if all(r != Is.ISNT for r in rs):
            return Is.MAYBE
        return Is.ISNT
    return Is.ISNT


def non_nullable(t: OctoType) -> OctoType:
    """Strip NULL from a union (types.go:425-442)."""
    if t.id == TypeID.UNION:
        rest = [a for a in t.alts if a.id != TypeID.NULL]
        return union_of(*rest) if rest else NULL
    return t


_NUMERIC = {TypeID.INT, TypeID.FLOAT}


def to_spark(t: OctoType,
             union_carrier: str = "string") -> tuple[T.DataType, bool]:
    """(spark_type, nullable) under the union policy. Union columns
    that don't widen cleanly come back as a *carrier*:

    - ``"variant"`` (JSON sources): Spark 4 VariantType — preserves
      the exact runtime type per value (42 vs "42" vs [42,"42"]),
      the faithful mapping of the reference's union values
      (octosql/types.go union; tests/scenarios/outputs/json/union).
      ``::T`` compiles to TRY_CAST which extracts-or-NULLs.
    - ``"string"`` (CSV, whose cells are text anyway): the raw-text
      carrier the accessors ``try_cast`` out of."""
    if t.id == TypeID.UNION:
        nullable = any(a.id == TypeID.NULL for a in t.alts)
        core = non_nullable(t)
        if core.id != TypeID.UNION:
            dt, n2 = to_spark(core, union_carrier)
            return dt, nullable or n2
        if {a.id for a in core.alts} <= _NUMERIC:
            return T.DoubleType(), nullable
        if union_carrier == "variant":
            return T.VariantType(), True
        return T.StringType(), True  # raw-text carrier
    if t.id == TypeID.NULL:
        return T.NullType(), True
    if t.id == TypeID.INT:
        return T.LongType(), False
    if t.id == TypeID.FLOAT:
        return T.DoubleType(), False
    if t.id == TypeID.BOOLEAN:
        return T.BooleanType(), False
    if t.id == TypeID.STRING:
        return T.StringType(), False
    if t.id == TypeID.TIME:
        return T.TimestampType(), False
    if t.id == TypeID.DURATION:
        return T.DayTimeIntervalType(), False
    if t.id == TypeID.LIST:
        dt, n = to_spark(t.elem, union_carrier)
        return T.ArrayType(dt, containsNull=n), False
    if t.id == TypeID.STRUCT:
        return T.StructType([
            T.StructField(name, *_f(to_spark(ft, union_carrier)))
            for name, ft in t.fields
        ]), False
    if t.id == TypeID.TUPLE:
        return T.StructType([
            T.StructField(f"_{i+1}", *_f(to_spark(e, union_carrier)))
            for i, e in enumerate(t.elems)
        ]), False
    return T.StringType(), True  # ANY


def _f(pair: tuple[T.DataType, bool]) -> tuple[T.DataType, bool]:
    return pair
