"""Physical-plan auditing (SURVEY.md §4.2): the engine's scale claims
are checked, not asserted — tests inspect .explain output."""
