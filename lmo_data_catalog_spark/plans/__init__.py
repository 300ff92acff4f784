"""Plans: full reference-pipeline reproductions (SURVEY §3, §7 step 3)."""
