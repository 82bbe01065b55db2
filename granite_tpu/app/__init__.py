from .application import Application
from .headless import run_headless, add_headless_cli
