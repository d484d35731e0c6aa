"""Pipelines: CLI entry points for extract / train / score / leaderboard."""
