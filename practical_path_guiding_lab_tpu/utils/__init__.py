from .console import print_bold_underline, print_title  # noqa: F401
from .file_name_manager import FileNameManager  # noqa: F401
from .perf_data import PerformanceData  # noqa: F401
