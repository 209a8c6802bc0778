"""The 'trim' command package."""
