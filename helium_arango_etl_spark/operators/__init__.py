"""Query surface. Each public function takes (spark, sf_dir) and returns a
DataFrame whose column names exactly match the registered oracle SQL."""
