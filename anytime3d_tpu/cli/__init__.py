"""Command-line entry points replacing the reference's 34 root scripts:
``python -m anytime3d_tpu.cli.train --config <name>`` and
``python -m anytime3d_tpu.cli.evaluate --config <name>``.
"""
