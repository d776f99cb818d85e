"""Driver-side planning: manifest pruning, file scoping, bin packing inputs."""
