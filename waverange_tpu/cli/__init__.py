"""Command-line tools compatible with the reference's wrenc/wrdec/
wrmssgenc/wrmssgdec interfaces (argv, inmeta command files, stdin)."""
