"""Error taxonomy for the Ray-Data-native ksql engine.

Mirrors the plan-time error surface of the reference builder
(/root/reference/errors/errors.go and the rule checks in
ksql/select_builder.go:126-187, ksql/create_builder.go:45-72) without
porting any code: these are the errors a *planner* raises before any Ray
task launches.
"""

from __future__ import annotations


class KsqlRayError(Exception):
    """Base class for all engine errors."""


class PlanError(KsqlRayError):
    """A query plan violates a ksqlDB semantic rule (SURVEY.md §2.8)."""


class SchemaError(KsqlRayError):
    """Unknown column / type mismatch / bad relation reference."""


class CatalogError(KsqlRayError):
    """Unknown relation, duplicate relation, or invalid DDL."""


class TypeError_(KsqlRayError):
    """Literal or operand has an unsupported/unordered type
    (reference: ksql/conditionals.go:150-152, internal/util/types.go:134-148)."""


class MigrationError(KsqlRayError):
    """Bad migration file / non-monotonic version
    (reference: migrations/migrator.go:148-187)."""
