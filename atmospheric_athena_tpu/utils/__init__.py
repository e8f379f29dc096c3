"""Logging, timing, misc utilities (reference: src/ath_log.c, src/utils.c)."""
