"""Physical-plan audit utilities (see :mod:`.audit`)."""

from .audit import audit, executed_plan, formatted_plan  # noqa: F401
