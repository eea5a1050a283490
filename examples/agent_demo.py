"""Text-driven conversational agent (reference analog: README AgentFlow
example; drive with the keyboard instead of a microphone).

    python examples/agent_demo.py
    > set a timer
    ...
"""

import sys

sys.path.insert(0, ".")

from moonshine_tpu.agent.flow import AgentFlow


def set_timer(d):
    minutes = yield d.ask("How many minutes?")
    ok = yield d.confirm(f"Set a timer for {minutes}?")
    if ok:
        yield d.say(f"Timer set for {minutes}.")
    else:
        yield d.say("Cancelled.")


def pick_drink(d):
    choice = yield d.choose(
        "Tea or coffee?", {"tea": ["a cuppa", "earl grey"], "coffee": ["espresso", "latte"]}
    )
    yield d.say(f"One {choice} coming up.")


def main() -> None:
    agent = (
        AgentFlow()
        .use_embeddings(False)  # substring matching: no model download
        .speak_with(lambda text: print(f"[agent] {text}"))
        .listen_for("set a timer", set_timer)
        .listen_for("i want a drink", pick_drink)
        .otherwise(lambda text: print(f"[agent] (heard: {text!r})"))
        .load()
    )
    print("Say 'set a timer' or 'i want a drink'. Ctrl-D to exit.")
    try:
        for line in sys.stdin:
            agent.handle_utterance(line.strip())
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
