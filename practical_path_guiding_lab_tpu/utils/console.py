"""ANSI console helpers (reference common.py:241-266)."""


class bcolors:
    HEADER = "\033[95m"
    OKBLUE = "\033[94m"
    OKCYAN = "\033[96m"
    OKGREEN = "\033[92m"
    WARNING = "\033[93m"
    FAIL = "\033[91m"
    ENDC = "\033[0m"
    BOLD = "\033[1m"
    UNDERLINE = "\033[4m"


def print_title(text: str):
    bar = "=" * (len(text) + 8)
    print(f"{bcolors.HEADER}{bar}\n==  {text}  ==\n{bar}{bcolors.ENDC}")


def print_bold_underline(*args):
    text = " ".join(str(a) for a in args)
    print(f"{bcolors.BOLD}{bcolors.UNDERLINE}{text}{bcolors.ENDC}")


printTitle = print_title
printBoldUnderLine = print_bold_underline
