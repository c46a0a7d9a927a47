"""Parameterized query builders — the reference's query surface
(`RecentTweets.get_recent_tweets` / `count_tweets` / `Events.get_recent_events`
families) as DataFrame plan functions."""
