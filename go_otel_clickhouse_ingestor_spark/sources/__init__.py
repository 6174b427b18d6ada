"""Source builders: fixture tables and streaming inputs."""
