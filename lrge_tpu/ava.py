"""Namespace mirror of ``liblrge::ava`` (Builder + defaults)."""

from .strategy.ava import AvaStrategy, DEFAULT_AVA_NUM_READS, AvaBuilder as Builder

__all__ = ["Builder", "AvaStrategy", "DEFAULT_AVA_NUM_READS"]
