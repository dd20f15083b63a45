"""Builtin profile templates (reference: pkg/profile/templates.go
GetBuiltinTemplates / CreateFromTemplate / applyTemplateSubstitution,
templates.go:10-530).

The reference ships 7 parameterized profile skeletons ({{.var}} Go
template placeholders, one optional {{if .var}}...{{end}} conditional in
recent-updates) and instantiates them with required-variable validation,
defaults, comma-split issue_keys, and a final ValidateProfile gate. This
module mirrors that surface as plain data + a small substituter — pure
driver-side config, nothing here touches Spark.
"""

from __future__ import annotations

import re

#: template variable: (name, required, default) — name/repository are
#: required everywhere, matching the reference's Variables blocks.
BUILTIN_TEMPLATES: list[dict] = [
    {
        "id": "epic-all-issues",
        "name": "EPIC - All Issues",
        "description": "Sync all issues associated with an EPIC "
                       "(stories, subtasks, and related issues)",
        "category": "epic",
        "variables": [("name", True, None), ("epic_key", True, None),
                      ("repository", True, None)],
        "template": {
            "description": "Sync for EPIC {{.epic_key}} - all associated"
                           " issues",
            "epic_key": "{{.epic_key}}",
            "repository": "{{.repository}}",
            "concurrency": 5, "rate_limit": "500ms", "incremental": False,
            "force": False, "dry_run": False, "include_links": True,
            "tags": ["epic", "comprehensive"],
        },
    },
    {
        "id": "epic-stories-only",
        "name": "EPIC - Stories Only",
        "description": "Sync only the stories under an EPIC "
                       "(exclude subtasks and related issues)",
        "category": "epic",
        "variables": [("name", True, None), ("epic_key", True, None),
                      ("repository", True, None)],
        "template": {
            "description": "Sync for EPIC {{.epic_key}} - stories only",
            "jql": '"Epic Link" = {{.epic_key}} AND type = Story',
            "repository": "{{.repository}}",
            "concurrency": 5, "rate_limit": "500ms", "incremental": False,
            "force": False, "dry_run": False, "include_links": True,
            "tags": ["epic", "stories", "filtered"],
        },
    },
    {
        "id": "project-active-issues",
        "name": "Project - Active Issues",
        "description": "Sync all active (non-closed) issues in a project",
        "category": "project",
        "variables": [("name", True, None), ("project_key", True, None),
                      ("repository", True, None)],
        "template": {
            "description": "Active issues for project {{.project_key}}",
            "jql": "project = {{.project_key}} AND status != Closed AND"
                   " status != Done",
            "repository": "{{.repository}}",
            "concurrency": 8, "rate_limit": "300ms", "incremental": True,
            "force": False, "dry_run": False, "include_links": True,
            "tags": ["project", "active", "incremental"],
        },
    },
    {
        "id": "my-current-sprint",
        "name": "My Current Sprint",
        "description": "Sync issues assigned to you in the current sprint",
        "category": "personal",
        "variables": [("name", True, None), ("repository", True, None)],
        "template": {
            "description": "My issues in current sprint",
            "jql": "assignee = currentUser() AND sprint in openSprints()",
            "repository": "{{.repository}}",
            "concurrency": 3, "rate_limit": "1s", "incremental": True,
            "force": False, "dry_run": False, "include_links": False,
            "tags": ["personal", "sprint", "current"],
        },
    },
    {
        "id": "recent-updates",
        "name": "Recent Updates",
        "description": "Sync recently updated issues across projects",
        "category": "monitoring",
        "variables": [("name", True, None), ("repository", True, None),
                      ("days", False, "7"), ("project_filter", False, None)],
        "template": {
            "description": "Recently updated issues (last {{.days}} days)",
            "jql": "updated >= -{{.days}}d{{if .project_filter}} AND"
                   " project in ({{.project_filter}}){{end}}",
            "repository": "{{.repository}}",
            "concurrency": 6, "rate_limit": "400ms", "incremental": True,
            "force": False, "dry_run": False, "include_links": True,
            "tags": ["recent", "updates", "monitoring"],
        },
    },
    {
        "id": "custom-jql",
        "name": "Custom JQL Query",
        "description": "Create a profile with a custom JQL query",
        "category": "custom",
        "variables": [("name", True, None), ("jql", True, None),
                      ("repository", True, None)],
        "template": {
            "description": "Custom JQL: {{.jql}}",
            "jql": "{{.jql}}",
            "repository": "{{.repository}}",
            "concurrency": 5, "rate_limit": "500ms", "incremental": False,
            "force": False, "dry_run": False, "include_links": True,
            "tags": ["custom", "jql"],
        },
    },
    {
        "id": "issue-list",
        "name": "Specific Issue List",
        "description": "Sync a specific list of issue keys",
        "category": "custom",
        "variables": [("name", True, None), ("issue_keys", True, None),
                      ("repository", True, None)],
        "template": {
            "description": "Specific issues: {{.issue_keys}}",
            "repository": "{{.repository}}",
            "concurrency": 3, "rate_limit": "500ms", "incremental": False,
            "force": False, "dry_run": False, "include_links": True,
            "tags": ["specific", "issues"],
        },
    },
]

_COND_RE = re.compile(r"\{\{if \.(\w+)\}\}(.*?)\{\{end\}\}", re.DOTALL)
_VAR_RE = re.compile(r"\{\{\.(\w+)\}\}")


def get_templates() -> list[dict]:
    """GetTemplates (templates.go:347-349)."""
    return BUILTIN_TEMPLATES


def get_template(template_id: str) -> dict:
    """GetTemplate (templates.go:352-363) — KeyError when unknown."""
    for t in BUILTIN_TEMPLATES:
        if t["id"] == template_id:
            return t
    raise KeyError(f"template {template_id!r} not found")


def templates_by_category() -> dict[str, list[dict]]:
    """GetTemplatesByCategory (templates.go:491-504)."""
    out: dict[str, list[dict]] = {}
    for t in BUILTIN_TEMPLATES:
        out.setdefault(t["category"], []).append(t)
    return out


def _substitute(text: str, variables: dict[str, str]) -> str:
    """{{.var}} substitution plus the one Go-template conditional form
    the builtin set uses ({{if .var}}...{{end}}: keep the body iff the
    variable is present and non-empty — applyTemplateSubstitution via
    text/template, templates.go:430-489)."""

    def _cond(m: re.Match) -> str:
        return m.group(2) if variables.get(m.group(1)) else ""

    text = _COND_RE.sub(_cond, text)
    return _VAR_RE.sub(lambda m: str(variables.get(m.group(1), "")), text)


def create_from_template(
    template_id: str, name: str, variables: dict[str, str] | None = None
) -> dict:
    """CreateFromTemplate (templates.go:365-427): required-variable
    check (name rides as the parameter), defaults for optional vars,
    placeholder substitution across description/jql/epic_key/repository,
    comma-split issue_keys, and a final validity gate. Returns the
    instantiated profile dict — persisting it is the caller's move
    (ProfileStore.create), exactly like the reference returns *Profile."""
    from jira_cdc_git_spark.profile_store import ProfileStore

    tmpl = get_template(template_id)
    vars_full = dict(variables or {})
    vars_full["name"] = name
    for var, required, default in tmpl["variables"]:
        if required and var != "name" and not vars_full.get(var):
            raise ValueError(f"required variable {var!r} not provided")
        if not required and default is not None and var not in vars_full:
            vars_full[var] = default
    profile: dict = {"name": name}
    for field, value in tmpl["template"].items():
        if isinstance(value, str):
            profile[field] = _substitute(value, vars_full)
        elif isinstance(value, list):
            profile[field] = list(value)
        else:
            profile[field] = value
    if vars_full.get("issue_keys"):
        profile["issue_keys"] = [
            k.strip() for k in vars_full["issue_keys"].split(",") if k.strip()
        ]
    report = ProfileStore.validate_profile(profile)
    if not report["valid"]:
        raise ValueError(
            "generated profile is invalid: " + "; ".join(report["errors"])
        )
    return profile
