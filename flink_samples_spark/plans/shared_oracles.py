"""Oracles shared by batch/stream twin queries.

A parity pair (PARITY.md) must be held to ONE oracle — duplicating
the SQL string per catalog invites silent drift where editing one
side breaks the guarantee without any test noticing. Twins import
these constants instead (the dynamic-gap session pair uses the same
pattern locally in catalog_streaming._DYN_SESSION_ORACLE, where both
twins live in one module).
"""

# The FLAGSHIP gaps-and-islands session SQL (q_session_window /
# q_stream_session): 5 s gap, new-session condition strictly > gap
# (Spark merges boundary-equal events), window_end = last ts + gap.
SESSION_WINDOW_ORACLE = """
    WITH lagged AS (
      SELECT ts, lag(ts) OVER (ORDER BY ts) AS prev_ts FROM events
    ), sess AS (
      SELECT ts,
             SUM(CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 5 SECOND THEN 1 ELSE 0 END)
               OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagged
    )
    SELECT MIN(ts) AS window_start,
           MAX(ts) + INTERVAL 5 SECOND AS window_end,
           COUNT(*) AS total
    FROM sess GROUP BY sid
    """

# Per-key EWMA recursion (q_ts_ewma / q_stream_ewma): dyadic α=0.25,
# explicit half-away rounding formula matching both engines.
EWMA_ORACLE = """
    WITH RECURSIVE ordered AS (
      SELECT event_id, user_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events
    ), rec AS (
      SELECT event_id, user_id, ts, value, rn, CAST(value AS DOUBLE) AS s
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.event_id, o.user_id, o.ts, o.value, o.rn,
             0.25 * o.value + 0.75 * r.s
      FROM ordered o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT event_id, user_id, ts, value,
           sign(s) * floor(abs(s) * 1e6 + 0.5) / 1e6 AS ewma FROM rec
"""

# CEP click→error→purchase earliest-match chain within 2 h
# (q_pattern_seq / q_stream_pattern_seq).
PATTERN_SEQ_ORACLE = """
    WITH c AS (SELECT user_id, ts AS ts_0 FROM events WHERE event_type = 'click'),
    e AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    s1 AS (
      SELECT c.user_id, ts_0, MIN(e.ts) AS ts_1
      FROM c JOIN e ON e.user_id = c.user_id AND e.ts >= c.ts_0
      GROUP BY c.user_id, ts_0
    ), s2 AS (
      SELECT s1.user_id, ts_0, ts_1, MIN(p.ts) AS ts_2
      FROM s1 JOIN p ON p.user_id = s1.user_id AND p.ts >= s1.ts_1
      GROUP BY s1.user_id, ts_0, ts_1
    )
    SELECT user_id, ts_0, ts_1, ts_2 FROM s2
    WHERE epoch(ts_2) - epoch(ts_0) <= 7200
"""
