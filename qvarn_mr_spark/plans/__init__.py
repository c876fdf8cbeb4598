"""View-definition DSL and plan helpers."""
