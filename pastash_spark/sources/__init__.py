"""Sources & sinks: format readers (SURVEY.md §2.4), partitioned sinks
(§2.5), and the lineage/checkpoint table that makes batch runs resumable
(replaces the reference's file-position db, monitor_file.js:289-316)."""
