"""Structured Streaming surface — the engine's answer to the
reference's event-time scheduling semantics (SURVEY.md §2 G1-G3).

The reference is batch-with-cron (`dags/000_scrape_games_result.py:137`)
plus a data-driven trigger (`dags/031_schedule_dag_for_get_today_line_up.py:36-57`);
here the same event-time semantics are first-class: file-source streams,
watermarks for late data, windowed aggregation, and custom stateful
operators via ``applyInPandasWithState``.
"""
