"""End-to-end query plans: the LLM batch pipeline (§3.1 of SURVEY.md)
and the jobs-archive analytics path (§3.3)."""
